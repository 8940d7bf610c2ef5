"""Batched loader: threads prefetch fixed-shape numpy batches for the device.

Replaces torch DataLoader(num_workers=4) (reference training.py:241-244).
Design:
  * thread-pool sample fetch (datasets are numpy/PIL; PIL releases the GIL
    for decode/resize so threads scale like the reference's worker procs
    without pickling overhead);
  * per-host data sharding: with jax.process_count() > 1 each host owns the
    strided slice of the global index stream (SURVEY.md §2c "host data
    parallelism");
  * every batch is a dict of stacked numpy arrays with a 'valid' mask; tail
    batches are padded to full batch_size so jit never re-traces;
  * deterministic per-(seed, epoch, index) RNG for augmentations.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Any, Iterator

import numpy as np


def _pad_to(batch_list: list[dict], batch_size: int) -> tuple[list[dict], np.ndarray]:
    valid = np.zeros(batch_size, bool)
    valid[: len(batch_list)] = True
    while len(batch_list) < batch_size:
        batch_list.append(batch_list[-1])
    return batch_list, valid


def _stack(samples: list[dict], valid: np.ndarray) -> dict[str, Any]:
    keys = samples[0].keys()
    out = {k: np.stack([s[k] for s in samples]) for k in keys}
    out["valid"] = valid
    return out


class DataLoader:
    """Iterable over epochs of batches.

    Args:
      dataset: object with __len__ and get(idx, rng) -> dict of numpy arrays.
      batch_size: per-HOST batch size (global batch = batch_size * n_hosts
        when process_count > 1; the caller shards the host batch over local
        devices via pose3d_tpu.parallel.shard_batch).
      shuffle: reshuffle indices every epoch.
      drop_last: drop the ragged tail instead of padding it.
      num_workers: prefetch threads (0 = synchronous).
      seed: base seed for shuffling + per-sample augmentation RNG.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = False, num_workers: int = 4, seed: int = 46,
                 process_index: int | None = None, process_count: int | None = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.epoch = 0
        if process_index is None or process_count is None:
            try:
                import jax

                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        self.process_index = process_index
        self.process_count = process_count

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(idx)
        # per-host strided shard of the global stream
        return idx[self.process_index :: self.process_count]

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict[str, Any]]:
        indices = self._indices()
        bs = self.batch_size

        def fetch(i: int) -> dict:
            rng = np.random.default_rng((self.seed, self.epoch, int(i)))
            return self.dataset.get(int(i), rng)

        if self.num_workers <= 0:
            for start in range(0, len(indices), bs):
                chunk = indices[start : start + bs]
                if len(chunk) < bs and self.drop_last:
                    return
                samples = [fetch(i) for i in chunk]
                samples, valid = _pad_to(samples, bs)
                yield _stack(samples, valid)
            return

        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # pipeline: submit up to 2 batches ahead
            starts = list(range(0, len(indices), bs))
            pending: list[tuple[list, np.ndarray | None]] = []

            def submit(start):
                chunk = indices[start : start + bs]
                if len(chunk) < bs and self.drop_last:
                    return None
                return [pool.submit(fetch, i) for i in chunk]

            ahead = 2
            futures_q = []
            for s in starts[: ahead + 1]:
                f = submit(s)
                if f is not None:
                    futures_q.append(f)
            next_submit = ahead + 1
            while futures_q:
                futs = futures_q.pop(0)
                if next_submit < len(starts):
                    f = submit(starts[next_submit])
                    next_submit += 1
                    if f is not None:
                        futures_q.append(f)
                samples = [f.result() for f in futs]
                samples, valid = _pad_to(samples, bs)
                yield _stack(samples, valid)


class Prefetcher:
    """Overlap host batch prep + host->device transfer with device compute.

    A feeder thread pulls numpy batches from the loader and submits
    `place_fn` (pad/shard/device_put) to a small transfer pool; the consumer
    receives completed device batches IN ORDER, up to `depth` ahead.
    Threading matters: through the axon tunnel a bs46 image batch costs
    ~200 ms (u8) to transfer — synchronous placement would serialize that
    with the 70 ms device step (docs/PERF.md round 4 "sustained training");
    here transfers are I/O-bound and hide under the step + the decode
    workers, and two transfers can be in flight at once. Exceptions from the
    loader or place_fn re-raise at the consumer's next __next__."""

    _DONE = object()

    def __init__(self, iterator, place_fn, depth: int = 2,
                 transfer_threads: int = 2):
        import queue as _queue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        self._q: "_queue.Queue" = _queue.Queue(maxsize=max(1, depth))
        self._err: BaseException | None = None
        self._pool = ThreadPoolExecutor(max_workers=max(1, transfer_threads),
                                        thread_name_prefix="pose3d-transfer")

        def _run():
            try:
                for batch in iterator:
                    # futures enqueue in order -> consumer sees loader order
                    self._q.put(self._pool.submit(place_fn, batch))
            except BaseException as e:  # surfaced in __next__
                self._err = e
            finally:
                self._q.put(Prefetcher._DONE)

        self._thread = threading.Thread(target=_run, daemon=True,
                                        name="pose3d-prefetch")
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        out = self._q.get()
        if out is Prefetcher._DONE:
            self._thread.join()
            self._pool.shutdown(wait=False)
            if self._err is not None:
                raise self._err
            raise StopIteration
        return out.result()
