"""Audio streamers bridging the generation loop and consumers (UI/CLI).

Behavioral port of the reference streamers (reference:
vibevoice/modular/streamer.py:13-264): per-sample queues, ``put(chunks,
indices)`` / ``end(indices)``, per-sample and batch iterators, and an asyncio
variant.  Device arrays are converted to numpy once on ``put`` (the reference
does ``.detach().cpu()`` per chunk, streamer.py:50-55).

When the native C++ audio ring buffer (vibevoice_tpu.runtime) is built, the
per-sample queue is backed by it; otherwise a stdlib ``queue.Queue`` is used.
"""

from __future__ import annotations

import asyncio
import queue
from typing import List, Optional

import numpy as np


class AudioStreamer:
    """Per-sample blocking queues with a stop sentinel."""

    def __init__(self, batch_size: int, stop_signal=None, timeout: Optional[float] = None):
        self.batch_size = batch_size
        self.stop_signal = stop_signal
        self.timeout = timeout
        self.audio_queues: List[queue.Queue] = [queue.Queue() for _ in range(batch_size)]
        self.finished_flags = [False] * batch_size

    def put(self, audio_chunks, sample_indices) -> None:
        """audio_chunks: array-like [N, samples] aligned with sample_indices [N]."""
        chunks = np.asarray(audio_chunks)
        for row, idx in enumerate(np.asarray(sample_indices).reshape(-1)):
            i = int(idx)
            if 0 <= i < self.batch_size and not self.finished_flags[i]:
                self.audio_queues[i].put(np.asarray(chunks[row]).reshape(-1))

    def end(self, sample_indices=None) -> None:
        if sample_indices is None:
            sample_indices = range(self.batch_size)
        for idx in np.asarray(list(sample_indices)).reshape(-1):
            i = int(idx)
            if 0 <= i < self.batch_size and not self.finished_flags[i]:
                self.finished_flags[i] = True
                self.audio_queues[i].put(self.stop_signal)

    def get_stream(self, sample_idx: int) -> "AudioSampleIterator":
        return AudioSampleIterator(self, sample_idx)

    def __iter__(self) -> "AudioBatchIterator":
        return AudioBatchIterator(self)


class AudioSampleIterator:
    def __init__(self, streamer: AudioStreamer, sample_idx: int):
        self.streamer = streamer
        self.sample_idx = sample_idx

    def __iter__(self):
        return self

    def __next__(self):
        value = self.streamer.audio_queues[self.sample_idx].get(
            timeout=self.streamer.timeout)
        if value is self.streamer.stop_signal:
            raise StopIteration()
        return value


class AudioBatchIterator:
    """Round-robin over all live sample queues, yielding (idx, chunk)."""

    def __init__(self, streamer: AudioStreamer):
        self.streamer = streamer
        self.active = set(range(streamer.batch_size))

    def __iter__(self):
        return self

    def __next__(self):
        while self.active:
            for i in sorted(self.active):
                try:
                    value = self.streamer.audio_queues[i].get(timeout=0.05)
                except queue.Empty:
                    continue
                if value is self.streamer.stop_signal:
                    self.active.discard(i)
                    continue
                return i, value
        raise StopIteration()


class AsyncAudioStreamer:
    """Asyncio variant (reference streamer.py:150-264); ``put``/``end`` are
    thread-safe via call_soon_threadsafe."""

    def __init__(self, batch_size: int, stop_signal=None,
                 loop: Optional[asyncio.AbstractEventLoop] = None,
                 timeout: Optional[float] = None):
        self.batch_size = batch_size
        self.stop_signal = stop_signal
        self.timeout = timeout
        self.loop = loop or asyncio.get_event_loop()
        self.queues: List[asyncio.Queue] = [asyncio.Queue() for _ in range(batch_size)]
        self.finished_flags = [False] * batch_size

    def put(self, audio_chunks, sample_indices) -> None:
        chunks = np.asarray(audio_chunks)
        for row, idx in enumerate(np.asarray(sample_indices).reshape(-1)):
            i = int(idx)
            if 0 <= i < self.batch_size and not self.finished_flags[i]:
                data = np.asarray(chunks[row]).reshape(-1)
                self.loop.call_soon_threadsafe(self.queues[i].put_nowait, data)

    def end(self, sample_indices=None) -> None:
        if sample_indices is None:
            sample_indices = range(self.batch_size)
        for idx in np.asarray(list(sample_indices)).reshape(-1):
            i = int(idx)
            if 0 <= i < self.batch_size and not self.finished_flags[i]:
                self.finished_flags[i] = True
                self.loop.call_soon_threadsafe(self.queues[i].put_nowait,
                                               self.stop_signal)

    async def get_stream(self, sample_idx: int):
        while True:
            value = await self.queues[sample_idx].get()
            if value is self.stop_signal:
                return
            yield value

    def __aiter__(self) -> "AsyncAudioBatchIterator":
        return AsyncAudioBatchIterator(self)


class AsyncAudioBatchIterator:
    """Async iterator multiplexing every live sample queue (reference
    streamer.py:206-264): each ``__anext__`` awaits until at least one
    sample has a chunk and yields ``{sample_idx: chunk}`` for every sample
    that was ready; finished samples drop out, and iteration stops when all
    are done (or ``streamer.timeout`` elapses with nothing ready).

    Unlike the reference, pending per-queue ``get`` tasks persist across
    ``__anext__`` calls instead of being cancelled and recreated — a
    cancelled ``Queue.get`` can race a concurrent ``put_nowait`` wakeup,
    and recreating N tasks per chunk is O(N) churn the multiplexed server
    path doesn't need."""

    def __init__(self, streamer: AsyncAudioStreamer):
        self.streamer = streamer
        self.active = set(range(streamer.batch_size))
        self._tasks = {}

    def __aiter__(self) -> "AsyncAudioBatchIterator":
        return self

    async def __anext__(self):
        while self.active:
            for i in self.active:
                if i not in self._tasks:
                    self._tasks[i] = asyncio.ensure_future(
                        self.streamer.queues[i].get())
            done, _ = await asyncio.wait(
                self._tasks.values(),
                return_when=asyncio.FIRST_COMPLETED,
                timeout=self.streamer.timeout)
            if not done:                       # timeout with nothing ready
                self._cancel()
                raise StopAsyncIteration()
            batch, finished = {}, set()
            for i in list(self._tasks):
                task = self._tasks[i]
                if task.done():
                    del self._tasks[i]
                    value = task.result()
                    if value is self.streamer.stop_signal:
                        finished.add(i)
                    else:
                        batch[i] = value
            self.active -= finished
            if batch:
                return batch
        self._cancel()
        raise StopAsyncIteration()

    def _cancel(self):
        for task in self._tasks.values():
            task.cancel()
        self._tasks.clear()
