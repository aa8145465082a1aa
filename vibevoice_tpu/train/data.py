"""Training data collation.

The reference repo has no training driver or data pipeline (upstream trained
with nnscaler out-of-repo; the forward contract in modeling_vibevoice.py:332-477
defines what a batch must contain).  This module builds those batches from
(script text, target audio[, voice-prompt audio]) examples:

  layout per example (mirrors the inference prompt layout, §3.3, so the
  trained distribution matches serving):

      system/text tokens ... " Speech output:\n" speech_start
      [diffusion] x F_target   speech_end  eos

  * acoustic_input_mask  — True at the F_target diffusion slots: the target
    latents are spliced into the LM input (teacher forcing).
  * acoustic_loss_mask   — same positions: the diffusion head is trained to
    denoise the latent at each slot conditioned on the LM hidden state.
  * labels               — next-token CE targets; padding and voice-prompt
    latent positions are ignored (-100).
  * optional voice prompt — an extra speech segment after the speaker tag
    whose slots are input-only (spliced, not diffused): input mask True,
    loss mask False.

Batches are padded to quarter-octave token buckets so the jitted train step
sees a bounded set of shapes.
"""

from __future__ import annotations

import math
from typing import Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

IGNORE_INDEX = -100


def _bucket(n: int, base: int = 64) -> int:
    n = max(n, base)
    p = 1 << (n - 1).bit_length()
    step = max(p // 4, base)
    return -(-n // step) * step


class TrainingCollator:
    """Builds fixed-shape training batches from raw examples."""

    def __init__(self, tokenizer, frame_samples: int = 3200,
                 token_bucket: int = 64):
        self.tk = tokenizer
        self.frame = frame_samples
        self.token_bucket = token_bucket

    def _example(self, text: str, target_audio: np.ndarray,
                 voice_prompt: Optional[np.ndarray] = None):
        tk = self.tk
        ids: List[int] = []
        in_mask: List[bool] = []
        loss_mask: List[bool] = []

        def emit(tok_ids, inp=False, loss=False):
            ids.extend(tok_ids)
            in_mask.extend([inp] * len(tok_ids))
            loss_mask.extend([loss] * len(tok_ids))

        segments: List[np.ndarray] = []
        emit(tk.encode(text))
        if voice_prompt is not None:
            f = math.ceil(len(voice_prompt) / self.frame)
            emit([tk.speech_start_id])
            emit([tk.speech_diffusion_id] * f, inp=True, loss=False)
            emit([tk.speech_end_id])
            segments.append(voice_prompt)
        f_tgt = math.ceil(len(target_audio) / self.frame)
        emit(tk.encode(" Speech output:\n"))
        emit([tk.speech_start_id])
        emit([tk.speech_diffusion_id] * f_tgt, inp=True, loss=True)
        emit([tk.speech_end_id])
        emit([tk.eos_id])
        segments.append(target_audio)
        return (np.asarray(ids, np.int64), np.asarray(in_mask, bool),
                np.asarray(loss_mask, bool), segments)

    def __call__(self, examples: Sequence[dict]) -> Dict[str, np.ndarray]:
        """examples: dicts with keys text, target_audio[, voice_prompt]."""
        per = [self._example(e["text"], np.asarray(e["target_audio"], np.float32),
                             None if e.get("voice_prompt") is None
                             else np.asarray(e["voice_prompt"], np.float32))
               for e in examples]
        b = len(per)
        t = _bucket(max(len(p[0]) for p in per), self.token_bucket)

        ids = np.zeros((b, t), np.int64)
        attn = np.zeros((b, t), np.int64)
        in_mask = np.zeros((b, t), bool)
        loss_mask = np.zeros((b, t), bool)
        labels = np.full((b, t), IGNORE_INDEX, np.int64)
        all_segs: List[np.ndarray] = []
        pad_id = self.tk.pad_id
        ids[:] = pad_id
        for i, (eid, em_in, em_loss, segs) in enumerate(per):
            n = len(eid)
            ids[i, :n] = eid
            attn[i, :n] = 1
            in_mask[i, :n] = em_in
            loss_mask[i, :n] = em_loss
            lab = eid.copy()
            lab[em_in & ~em_loss] = IGNORE_INDEX   # voice-prompt latents
            labels[i, :n] = lab
            all_segs.extend(segs)

        # waveform segments -> one padded [N_seg, S] tensor + frame masks,
        # ordered to match the row-major order of True bits in in_mask
        n_seg = len(all_segs)
        frames = [math.ceil(len(s) / self.frame) for s in all_segs]
        f_max = max(frames)
        speech = np.zeros((n_seg, f_max * self.frame), np.float32)
        smask = np.zeros((n_seg, f_max), bool)
        for j, (s, f) in enumerate(zip(all_segs, frames)):
            speech[j, :len(s)] = s
            smask[j, :f] = True

        return {
            "input_ids": ids,
            "attention_mask": attn,
            "labels": labels,
            "speech_tensors": speech,
            "speech_masks": smask,
            "acoustic_input_mask": in_mask,
            "acoustic_loss_mask": loss_mask,
        }


def batch_iterator(examples: Iterable[dict], collator: TrainingCollator,
                   batch_size: int, shuffle_seed: Optional[int] = None,
                   drop_last: bool = True) -> Iterator[Dict[str, np.ndarray]]:
    """Epoch iterator over fixed-size batches (host-side; audio IO and
    tokenization stay off the device path)."""
    examples = list(examples)
    order = np.arange(len(examples))
    if shuffle_seed is not None:
        np.random.RandomState(shuffle_seed).shuffle(order)
    for i in range(0, len(order) - (batch_size - 1 if drop_last else 0),
                   batch_size):
        chunk = [examples[j] for j in order[i:i + batch_size]]
        if len(chunk) == batch_size or not drop_last:
            yield collator(chunk)
