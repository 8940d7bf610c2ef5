"""Test configuration: force an 8-device virtual CPU platform BEFORE jax import.

This is the TPU-native answer to "test multi-device without a cluster"
(SURVEY.md §4): every sharding/collective test runs against a virtual
8-device CPU mesh via --xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon/TPU: tests always run on virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin in this image overrides JAX_PLATFORMS at import time;
# the config update below reliably forces the virtual CPU platform.
jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, jax.devices()

import subprocess  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# build the native PLY reader if the toolchain is available (tests fall back
# to the numpy parser when it isn't)
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if not os.path.exists(os.path.join(_repo, "native", "libply_reader.so")):
    subprocess.run(["make", "-C", os.path.join(_repo, "native")],
                   capture_output=True, check=False)


@pytest.fixture
def rng():
    return np.random.default_rng(46)  # reference fixed seed (training.py:195)
