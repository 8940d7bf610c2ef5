"""Byte-capped LRU cache of decoded images: epochs >= 2 skip JPEG decode.

The host input pipeline re-decodes every source image every epoch (reference
dataset.py:531 `Image.open` inside `__getitem__`, re-run by the torch
DataLoader each epoch). Decode + file I/O is ~35% of per-sample host cost on
the sustained-training fixture (7.7 of 21.9 ms/sample — docs/PERF.md), and on
the 1-core sandbox host the decode rate IS the sustained-training wall. A
decoded-pixels cache is exact — decode is deterministic, and every PIL op the
datasets apply downstream (crop/resize/rotate/transpose/filter/paste-into-new)
returns a NEW image, so cached images can be handed out shared, no copy.

Semantics:
  * keyed by absolute path; stores fully-loaded PIL images (`.load()` forces
    the lazy decode at insert time);
  * LRU evicted to a byte budget (w*h*bands accounting), so real datasets
    (ObjectNet3D train is tens of GB decoded) degrade gracefully — hot items
    (MultiView renders: few hundred distinct files reused every epoch) pin
    themselves by recency while cold singletons churn;
  * thread-safe (the thread DataLoader calls dataset.get concurrently);
  * pickles EMPTY (capacity only): each ShmDataLoader spawn worker rebuilds
    its own cache, so worker hit rate for uniformly-shuffled sample images
    ramps as 1-((W-1)/W)^epoch per worker while shared render/background
    images hit from epoch 1 within each worker.

Opt-in via `decode_cache_mb` on the dataset constructors / the CLIs'
`--cache_decoded_mb` flag (default 0 = off, the reference-parity behavior).
"""

from __future__ import annotations

import threading
from collections import OrderedDict

from PIL import Image


def _nbytes(im: Image.Image) -> int:
    return im.size[0] * im.size[1] * len(im.getbands())


class DecodeCache:
    """LRU path -> decoded PIL image, capped at `capacity_mb` megabytes."""

    def __init__(self, capacity_mb: float):
        self.capacity_mb = float(capacity_mb)
        self._cap = int(capacity_mb * (1 << 20))
        self._lock = threading.Lock()
        self._items: OrderedDict[str, Image.Image] = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def open_rgb(self, path: str) -> Image.Image:
        """`Image.open(path).convert('RGB')` through the cache."""
        return self._open(path, "RGB")

    def open_raw(self, path: str) -> Image.Image:
        """`Image.open(path)` (native mode, e.g. RGBA renders) through the
        cache. Mode participates in the key so both views of one file can
        coexist."""
        return self._open(path, None)

    def _open(self, path: str, mode: str | None) -> Image.Image:
        key = f"{mode or '*'}:{path}"
        with self._lock:
            im = self._items.get(key)
            if im is not None:
                self._items.move_to_end(key)
                self.hits += 1
                return im
            self.misses += 1
        im = Image.open(path)
        if mode is not None and im.mode != mode:
            im = im.convert(mode)
        im.load()  # force the decode now, outside the lock
        n = _nbytes(im)
        if n > self._cap:
            return im  # larger than the whole budget: serve uncached
        with self._lock:
            if key not in self._items:
                self._items[key] = im
                self._bytes += n
                while self._bytes > self._cap and len(self._items) > 1:
                    _, old = self._items.popitem(last=False)
                    self._bytes -= _nbytes(old)
            else:
                self._items.move_to_end(key)
            return self._items[key]

    def stats(self) -> dict:
        with self._lock:
            return {"items": len(self._items), "mb": self._bytes / (1 << 20),
                    "hits": self.hits, "misses": self.misses}

    # spawn workers get an empty cache with the same budget — decoded PIL
    # buffers never cross the pickle boundary.
    def __getstate__(self):
        return {"capacity_mb": self.capacity_mb}

    def __setstate__(self, state):
        self.__init__(state["capacity_mb"])


class _NoCache:
    """Zero-overhead stand-in when caching is off (the default)."""

    def open_rgb(self, path: str) -> Image.Image:
        return Image.open(path).convert("RGB")

    def open_raw(self, path: str) -> Image.Image:
        return Image.open(path)

    def stats(self) -> dict:
        return {"items": 0, "mb": 0.0, "hits": 0, "misses": 0}


def make(capacity_mb: float):
    return DecodeCache(capacity_mb) if capacity_mb and capacity_mb > 0 else _NoCache()
