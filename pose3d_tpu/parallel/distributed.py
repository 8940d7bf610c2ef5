"""Multi-host initialization helper.

The reference is strictly single-process/single-GPU (SURVEY.md §2c). For TPU
pods, call `maybe_initialize()` once at program start: it wires
jax.distributed from the standard TPU environment variables when running
multi-host, and is a no-op on a single host (including the single-chip dev
box and CPU test runs). Host-side input sharding then follows from
jax.process_index()/process_count() inside pose3d_tpu.data.loader.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize() -> bool:
    """Initialize jax.distributed when a multi-host environment is detected.

    Returns True when distributed mode is active.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    # standard TPU pod envs set by the runtime; absent on single host
    multi = any(os.environ.get(k) for k in
                ("MEGASCALE_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                 "JAX_COORDINATOR_ADDRESS"))
    if multi:
        jax.distributed.initialize()
    _initialized = True
    return jax.process_count() > 1
