"""Train state + optimizer construction.

Optimizer parity with the reference recipes:
  * torch.optim.Adam(lr, weight_decay=5e-4) — L2 penalty added to the
    gradient BEFORE the Adam moments (training.py:269, trainingKD.py:246-249).
    `torch_style_adam` reproduces that ordering (this is NOT decoupled AdamW).
  * torch.optim.lr_scheduler.MultiStepLR([decrease], gamma=0.1) —
    `multistep_lr` builds the equivalent piecewise-constant *epoch* schedule;
    steps.py converts epochs to optimizer steps via steps_per_epoch.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    """Carries params + BN stats + optimizer state + RNG for one model."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None, new_rng=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
            opt_state=new_opt_state,
            rng=new_rng if new_rng is not None else self.rng,
        )


def torch_style_adam(
    learning_rate: float | Callable,
    weight_decay: float = 5e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """torch.optim.Adam(weight_decay=...) parity: grad += wd * param, then Adam."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def multistep_lr(
    base_lr: float, milestones_steps: Sequence[int], gamma: float = 0.1
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Piecewise-constant schedule over optimizer steps (MultiStepLR parity)."""
    boundaries = {int(m): gamma for m in milestones_steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def create_train_state(
    model,
    example_inputs: tuple,
    rng: jax.Array,
    tx: optax.GradientTransformation,
) -> TrainState:
    """Initialize a model (KaiMing-style initializers are baked into the
    modules, matching auxiliary/utils.py:23-36) and wrap it in a TrainState."""
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init({"params": init_rng, "dropout": init_rng},
                           *example_inputs, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=state_rng,
        tx=tx,
    )
