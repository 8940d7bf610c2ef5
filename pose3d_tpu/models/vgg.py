"""Flax VGG (the student backbone).

Capability parity with /root/reference/auxiliary/vgg.py: torchvision-style
VGG with config A/B/D/E, classifier 512*7*7 -> 4096 -> 4096 -> num_classes
with dropout after the first two ReLUs (vgg.py:39-55). The student uses
vgg11(num_classes=2048) (auxiliary/model.py:28) and forward returns a single
tensor.

TPU-first: NHWC, static shapes, dtype-parameterized for bf16 MXU compute.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from pose3d_tpu.models.common import kaiming_leaky02, dense_init_1e3, bn_mask
from jax.nn.initializers import zeros

CFG = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M",
          512, 512, 512, 512, "M"],
}


class VGG(nn.Module):
    cfg: Sequence
    num_classes: int = 1000
    batch_norm: bool = False
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32
    axis_name: str | None = None
    width_mult: float = 1.0  # extension: narrower students for faster
    # inference — the natural target of the KD pipeline (not in the reference)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                if self.width_mult != 1.0:
                    v = max(16, int(round(v * self.width_mult / 16)) * 16)
                x = nn.Conv(v, (3, 3), padding="SAME", use_bias=True,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            kernel_init=kaiming_leaky02, bias_init=zeros)(x)
                if self.batch_norm:
                    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                     epsilon=1e-5, dtype=self.dtype,
                                     param_dtype=jnp.float32,
                                     axis_name=self.axis_name if train else None)(
                        x, mask=bn_mask(mask, x) if train else None)
                x = nn.relu(x)

        # classifier: flatten 7x7x512 -> 4096 -> 4096 -> num_classes
        x = x.reshape(x.shape[0], -1)
        for _ in range(2):
            x = nn.Dense(4096, dtype=self.dtype, param_dtype=jnp.float32,
                         kernel_init=dense_init_1e3, bias_init=zeros)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=dense_init_1e3, bias_init=zeros)(x)
        return x


def _make(cfg_key: str, batch_norm: bool = False):
    def ctor(num_classes: int = 1000, dtype: Any = jnp.float32,
             axis_name: str | None = None, width_mult: float = 1.0) -> VGG:
        return VGG(cfg=CFG[cfg_key], num_classes=num_classes, batch_norm=batch_norm,
                   dtype=dtype, axis_name=axis_name, width_mult=width_mult)

    return ctor


vgg11 = _make("A")
vgg11_bn = _make("A", batch_norm=True)
vgg13 = _make("B")
vgg13_bn = _make("B", batch_norm=True)
vgg16 = _make("D")
vgg16_bn = _make("D", batch_norm=True)
vgg19 = _make("E")
vgg19_bn = _make("E", batch_norm=True)
