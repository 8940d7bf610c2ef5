"""2x2/2 max pooling with a custom (select-and-scatter-free) backward pass.

STATUS: measured NEGATIVE result — NOT wired into the models. Kept as the
record of the experiment (like ops/vgg_stem.py in round 1) and as a correct,
tested custom-VJP pool should a future XLA version change the tradeoff.

Motivation: XLA lowers `nn.max_pool`'s gradient to `select-and-scatter`, the
single most expensive op of the KD train step at the student VGG's
224x224x64 first block (~5.6 ms/step of 85, ~8 ms/step over all pools —
trace table in docs/PERF.md). Three jnp-level replacements were built and
measured on the chip (bs=46 KD step, baseline 86.8 ms / 529.9 samples/s):

  v1  stacked (N, Hp, Wp, 4, C) windows, argmax residual  -> 118.8 ms (-37%)
      the size-4 window dim lands in the sublane position (8x tile padding)
      and the re-layout breaks XLA's conv->pool forward fusion;
  v2  fwd untouched, bwd via 6-D reshape window views      -> 115.1 ms
      the (N, H/2, 2, W/2, 2, C) split can't keep the NHWC tiling: the trace
      shows ~26 ms/step of pure layout copies (copy.134, pad_maximum_fusion,
      bitcast fusions) replacing ~8 ms of SAS;
  v3  bwd via stride-2 lax.slice + interior-padded lax.pad -> 131.1 ms
      stride-2 H/W access is itself a cross-sublane gather on this layout.

Conclusion: on TPU the windowed restructuring of a large NHWC-tiled
activation costs more in relayout than select-and-scatter costs in
scanning; SAS stays. The productive lever was algebraic instead: relu and
max-pool commute, so the VGG applies relu AFTER the pool (models/vgg.py),
which shrinks the elementwise work and removes the full-res relu recompute
from the backward.

The current file keeps variant v2 (first-tie-wins torch semantics,
/root/reference/auxiliary/vgg.py:60; parity-tested against torch MaxPool2d
in tests/test_ops.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


@jax.custom_vjp
def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Non-overlapping 2x2 stride-2 max pool over NHWC (H, W even)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _fwd(x: jnp.ndarray):
    y = nn.max_pool(x, (2, 2), strides=(2, 2))
    return y, (x, y)


def _bwd(res, cot):
    x, y = res
    n, h, w, c = x.shape
    xw = x.reshape(n, h // 2, 2, w // 2, 2, c)
    taken = None
    slots = []
    for dy in (0, 1):
        row = []
        for dx in (0, 1):
            hit = xw[:, :, dy, :, dx, :] == y
            win = hit if taken is None else hit & ~taken
            taken = hit if taken is None else taken | hit
            row.append(jnp.where(win, cot, jnp.zeros_like(cot)))
        slots.append(jnp.stack(row, axis=3))       # (N, Hp, Wp, 2, C) over dx
    gw = jnp.stack(slots, axis=2)                  # (N, Hp, 2, Wp, 2, C)
    return (gw.reshape(n, h, w, c),)


max_pool_2x2.defvjp(_fwd, _bwd)


def max_pool(x: jnp.ndarray, window: tuple[int, int] = (2, 2),
             strides: tuple[int, int] = (2, 2)) -> jnp.ndarray:
    """Drop-in for nn.max_pool that routes the 2x2/2 even-size case through
    the custom-VJP kernel and everything else through flax."""
    if (window == (2, 2) and strides == (2, 2)
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        return max_pool_2x2(x)
    return nn.max_pool(x, window, strides=strides)
