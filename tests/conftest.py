"""Test configuration: force an 8-device virtual CPU mesh.

The reference only ever runs on real Sunway hardware (SURVEY §4); we do
strictly better by making the whole suite CPU-runnable — Pallas kernels in
interpreter mode, the shard_map/ppermute halo path on 8 virtual devices via
``--xla_force_host_platform_device_count`` — so correctness is testable
anywhere, and real-TPU runs are a pure performance concern.

Environment must be set before the first ``import jax`` anywhere in the
test process, hence this lives at the top of conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    # 10 = the 8-device test meshes + spare devices. The spare is
    # load-bearing on small hosts: the Pallas TPU-interpret machinery's
    # io_callbacks BLOCK their executor thread (semaphore waits, pending-
    # operand np.array), and a mesh that uses EVERY forced device leaves
    # no execute thread to fulfill pending cross-program transfers (e.g.
    # the non-contiguous shards of a 2-axis-sharded rank-3 array) —
    # deadlocking the whole suite. Bisected on a 1-CPU host: an N-device
    # mesh hangs at N forced devices and passes at N+1.
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=10"
    ).strip()

import jax  # noqa: E402

# Some environments force a hardware platform via a plugin (e.g. the axon
# TPU tunnel sets JAX_PLATFORMS=axon at a higher priority than our env
# override); the config API wins over both.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
