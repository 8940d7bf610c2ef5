"""Tests for optimizer utilities (freeze masks, param counting)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from pose3d_tpu.utils import frozen_tx, count_parameters


def test_frozen_tx_zeroes_selected_subtree():
    params = {"VGG_0": {"k": jnp.ones(3)}, "head": {"k": jnp.ones(3)}}
    grads = {"VGG_0": {"k": jnp.full(3, 2.0)}, "head": {"k": jnp.full(3, 2.0)}}
    tx = frozen_tx(optax.sgd(0.5), lambda p: p[0] == "VGG_0")
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_array_equal(np.asarray(updates["VGG_0"]["k"]), 0.0)
    np.testing.assert_array_equal(np.asarray(updates["head"]["k"]), -1.0)


def test_count_parameters():
    params = {"a": jnp.zeros((2, 3)), "b": {"c": jnp.zeros(5)}}
    assert count_parameters(params) == 11
