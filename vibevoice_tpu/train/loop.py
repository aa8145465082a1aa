"""Training loop driver.

The reference ships only the training forward (its driver lived in nnscaler,
out-of-repo — SURVEY.md §3.2); this is the full driver: sharded step over a
("dp","tp") mesh with optional FSDP, metric logging, periodic Orbax
checkpointing and resume.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VibeVoiceConfig
from .trainer import TrainState, make_train_step


def train_loop(cfg: VibeVoiceConfig,
               batches: Iterable[Dict[str, np.ndarray]],
               params: Optional[dict] = None,
               num_steps: Optional[int] = None,
               mesh=None, fsdp: bool = False,
               optimizer=None,
               ckpt_dir: Optional[str] = None,
               ckpt_every: int = 1000,
               log_every: int = 10,
               log_fn: Callable[[str], None] = print,
               seed: int = 0,
               dtype=jnp.float32) -> TrainState:
    """Run training over `batches` (an iterator of collated batches).

    With `mesh`, params get TP(/FSDP) shardings and batches shard on dp.
    Checkpoints land in `ckpt_dir/step_N`; if `ckpt_dir` holds a previous
    checkpoint, training resumes from the newest one.
    """
    from ..models import vibevoice

    rng = jax.random.PRNGKey(seed)
    start_step = 0
    if params is None:
        resume = _latest_checkpoint(ckpt_dir) if ckpt_dir else None
        if resume is not None:
            from ..checkpoint import load_checkpoint
            params, _ = load_checkpoint(resume)
            start_step = int(os.path.basename(resume).split("_")[-1])
            log_fn(f"resumed from {resume} (step {start_step})")
        else:
            rng, k = jax.random.split(rng)
            params = vibevoice.init_params(k, cfg, dtype)

    if mesh is not None:
        from ..parallel import infer_kv_tp, param_shardings
        kv_tp = infer_kv_tp(cfg.decoder, mesh)
        sh = param_shardings(params, mesh, kv_tp=kv_tp, fsdp=fsdp)
        params = jax.tree.map(jax.device_put, params, sh)

    init_state, train_step = make_train_step(cfg, optimizer=optimizer)
    state = init_state(params)
    if start_step:
        state = state._replace(step=jnp.int32(start_step))
    jitted = jax.jit(train_step, donate_argnums=(0,))

    if mesh is not None:
        from ..parallel import batch_shardings

    t0 = time.perf_counter()
    last_saved = -1
    ctx = mesh if mesh is not None else contextlib.nullcontext()
    with ctx:
        for i, batch in enumerate(batches):
            step_no = start_step + i + 1
            if num_steps is not None and i >= num_steps:
                break
            if mesh is not None:
                batch = jax.tree.map(jax.device_put, batch,
                                     batch_shardings(mesh, batch))
            rng, k = jax.random.split(rng)
            state, metrics = jitted(state, batch, k)
            if step_no % log_every == 0 or (num_steps and i + 1 >= num_steps):
                m = {k2: float(v) for k2, v in metrics.items()}
                dt = time.perf_counter() - t0
                log_fn(f"step {step_no}: loss={m['loss']:.4f} "
                       f"ce={m['ce_loss']:.4f} diff={m['diffusion_loss']:.4f} "
                       f"gnorm={m['grad_norm']:.3f} ({dt / max(i + 1, 1):.2f}s/step)")
            if ckpt_dir and step_no % ckpt_every == 0:
                _save(ckpt_dir, state, cfg, step_no, log_fn)
                last_saved = step_no
    if ckpt_dir and int(state.step) != last_saved and int(state.step) > start_step:
        _save(ckpt_dir, state, cfg, int(state.step), log_fn)
    return state


def _save(ckpt_dir: str, state: TrainState, cfg, step: int, log_fn) -> None:
    from ..checkpoint import save_checkpoint
    path = os.path.join(ckpt_dir, f"step_{step}")
    save_checkpoint(path, jax.device_get(state.params), cfg, step=step)
    log_fn(f"checkpointed {path}")


def _latest_checkpoint(ckpt_dir: Optional[str]) -> Optional[str]:
    if not ckpt_dir or not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for d in os.listdir(ckpt_dir):
        if d.startswith("step_") and d.split("_")[-1].isdigit():
            steps.append((int(d.split("_")[-1]), os.path.join(ckpt_dir, d)))
    return max(steps)[1] if steps else None
