"""Shared-memory process-worker loader: the fix for the host-pipeline wall.

The thread `DataLoader` (loader.py) tops out ~52-66 samples/s on the 3-view
contrast pipeline because the augmentations hold the GIL (docs/PERF.md), and a
naive process *pool* measured WORSE (18-23/s) because every sample is pickled
through an IPC pipe. This loader removes both costs, torch-DataLoader style:

  * spawn-context worker processes (no fork-after-JAX deadlock, no GIL
    sharing) each assemble ENTIRE stacked batches;
  * batches are written directly into preallocated `SharedMemory` slots —
    the only thing crossing the result pipe is a (slot, seq, valid) tuple;
  * the parent hands out slots through a free-list, so at most `slots`
    batches are in flight and memory is bounded;
  * batch order is deterministic and identical to loader.DataLoader: the
    same per-(seed, epoch) shuffle and per-(seed, epoch, index) sample RNG,
    with results re-ordered by sequence number before yielding.

Replaces the reference's `DataLoader(num_workers=4)` worker processes
(reference training.py:241-244) for the real-data training path.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import pickle
import traceback
from multiprocessing import shared_memory
from typing import Any, Iterator

import numpy as np

_SHM_PREFIX = "pose3d"


def batch_spec(sample: dict[str, np.ndarray], batch_size: int) -> list[tuple[str, tuple, str]]:
    """(key, stacked shape, dtype str) for every array in a batch, plus the
    'valid' mask — fixed order so parent and workers agree on the layout."""
    spec = []
    for k in sorted(sample.keys()):
        arr = np.asarray(sample[k])
        spec.append((k, (batch_size, *arr.shape), arr.dtype.str))
    spec.append(("valid", (batch_size,), np.dtype(bool).str))
    return spec


def _spec_layout(spec) -> tuple[list[tuple[str, tuple, str, int]], int]:
    """Byte offsets per key (64-byte aligned) and the total slot size."""
    layout, off = [], 0
    for k, shape, dt in spec:
        nbytes = int(np.prod(shape)) * np.dtype(dt).itemsize
        layout.append((k, shape, dt, off))
        off += (nbytes + 63) & ~63
    return layout, max(off, 1)


def _slot_views(buf, layout) -> dict[str, np.ndarray]:
    return {
        k: np.ndarray(shape, dtype=dt, buffer=buf, offset=off)
        for k, shape, dt, off in layout
    }


def _worker_main(dataset_bytes: bytes, spec, shm_names: list[str],
                 task_q, result_q) -> None:
    """Worker loop: pull (seq, slot, epoch, indices) tasks, write the stacked
    batch into the slot, report (seq, slot, n_valid). None = shutdown."""
    try:
        dataset = pickle.loads(dataset_bytes)
        layout, _ = _spec_layout(spec)
        # spawn children inherit the parent's resource tracker fd, so the
        # attach-side registration is idempotent (set semantics) and only the
        # parent's unlink() unregisters — no premature-unlink workaround
        # needed on CPython 3.12 Linux.
        shms = [shared_memory.SharedMemory(name=n) for n in shm_names]
        views = [_slot_views(shm.buf, layout) for shm in shms]
    except BaseException:
        result_q.put(("error", traceback.format_exc()))
        return
    try:
        while True:
            task = task_q.get()
            if task is None:
                break
            seq, slot, seed, epoch, indices = task
            try:
                out = views[slot]
                n = len(indices)
                bs = out["valid"].shape[0]
                for j, idx in enumerate(indices):
                    rng = np.random.default_rng((seed, epoch, int(idx)))
                    sample = dataset.get(int(idx), rng)
                    for k, v in sample.items():
                        out[k][j] = v
                # pad the ragged tail by repeating the last sample (same
                # semantics as loader._pad_to)
                for j in range(n, bs):
                    for k in out:
                        if k != "valid":
                            out[k][j] = out[k][n - 1]
                out["valid"][:] = False
                out["valid"][:n] = True
                result_q.put(("ok", seq, slot, n))
            except BaseException:
                result_q.put(("error", traceback.format_exc()))
    finally:
        del views
        for shm in shms:
            shm.close()


class ShmDataLoader:
    """Drop-in for loader.DataLoader backed by shared-memory process workers.

    Same constructor surface plus:
      slots: number of in-flight batch buffers (default num_workers + 2).
      copy: if True (default) yielded batches are private copies; if False
        they are zero-copy views into the slot, recycled after the NEXT
        batch is requested — safe when the consumer transfers to device
        immediately (e.g. via train.Prefetcher's place_fn).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = False, num_workers: int = 4, seed: int = 46,
                 process_index: int | None = None, process_count: int | None = None,
                 slots: int | None = None, copy: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.epoch = 0
        self.copy = copy
        self.slots = slots if slots is not None else self.num_workers + 2
        if process_index is None or process_count is None:
            try:
                import jax

                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        self.process_index = process_index
        self.process_count = process_count
        self._started = False
        self._closed = False
        self._outstanding = 0  # tasks submitted but not yet acknowledged

    # -- identical index stream to loader.DataLoader ------------------------
    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(idx)
        return idx[self.process_index :: self.process_count]

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    # -- worker lifecycle ----------------------------------------------------
    def _start(self) -> None:
        if self._started:
            return
        probe = self.dataset.get(0, np.random.default_rng(0))
        self._spec = batch_spec(probe, self.batch_size)
        self._layout, slot_bytes = _spec_layout(self._spec)
        uniq = f"{_SHM_PREFIX}_{os.getpid()}_{id(self):x}"
        self._shms = [
            shared_memory.SharedMemory(create=True, size=slot_bytes,
                                       name=f"{uniq}_{i}")
            for i in range(self.slots)
        ]
        self._views = [_slot_views(shm.buf, self._layout) for shm in self._shms]
        ctx = mp.get_context("spawn")
        self._task_q = ctx.Queue()
        self._result_q = ctx.Queue()
        dataset_bytes = pickle.dumps(self.dataset)
        names = [shm.name for shm in self._shms]
        self._procs = [
            ctx.Process(target=_worker_main, daemon=True,
                        args=(dataset_bytes, self._spec, names,
                              self._task_q, self._result_q))
            for _ in range(self.num_workers)
        ]
        for p in self._procs:
            p.start()
        self._started = True

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        if self._started:
            for _ in self._procs:
                self._task_q.put(None)
            for p in self._procs:
                p.join(timeout=10)
                if p.is_alive():
                    p.terminate()
            self._views = None
            for shm in self._shms:
                shm.close()
                try:
                    shm.unlink()
                except FileNotFoundError:
                    pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    # -- iteration -----------------------------------------------------------
    def _drain_stale(self) -> None:
        """Wait out tasks left in flight by an abandoned iteration — they may
        still be writing into slots this iteration is about to reuse."""
        while self._outstanding > 0:
            msg = self._result_q.get()
            self._outstanding -= 1
            if msg[0] == "error":
                self.close()
                raise RuntimeError(f"ShmDataLoader worker failed:\n{msg[1]}")

    def __iter__(self) -> Iterator[dict[str, Any]]:
        if self._closed:
            raise RuntimeError("loader is closed")
        self._start()
        self._drain_stale()
        indices = self._indices()
        bs = self.batch_size
        starts = [s for s in range(0, len(indices), bs)
                  if not (self.drop_last and len(indices) - s < bs)]

        free = list(range(self.slots))
        next_task = 0
        done: dict[int, tuple[int, int]] = {}  # seq -> (slot, n_valid)
        retire: list[int] = []  # slots handed out zero-copy, pending reuse

        def submit() -> None:
            nonlocal next_task
            while free and next_task < len(starts):
                slot = free.pop()
                chunk = indices[starts[next_task] : starts[next_task] + bs]
                self._task_q.put((next_task, slot, self.seed, self.epoch,
                                  np.asarray(chunk, np.int64)))
                self._outstanding += 1
                next_task += 1

        submit()
        for seq in range(len(starts)):
            while seq not in done:
                msg = self._result_q.get()
                self._outstanding -= 1
                if msg[0] == "error":
                    self.close()
                    raise RuntimeError(f"ShmDataLoader worker failed:\n{msg[1]}")
                _, s, slot, n = msg
                done[s] = (slot, n)
            slot, n = done.pop(seq)
            views = self._views[slot]
            if self.copy:
                batch = {k: v.copy() for k, v in views.items()}
                free.append(slot)
            else:
                if retire:
                    free.append(retire.pop())
                batch = dict(views)
                retire.append(slot)
            submit()
            yield batch
        free.extend(retire)
