"""Test configuration: run the suite on CPU with 8 virtual devices.

Multi-chip sharding (mesh/pjit/psum) is tested the TPU way without a TPU
slice, per SURVEY.md section 4: force the host platform and fake 8 devices.
Must run before the first ``import jax`` anywhere in the test process.
"""

import os

# Force CPU even if the environment pins a TPU platform (e.g. JAX_PLATFORMS=axon):
# the unit suite must not contend for (or block on) the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import faulthandler

# Watchdog thread: this VM intermittently loses thread wakeups in XLA's CPU
# client (first dispatch can stall minutes on an idle machine); a periodic
# watchdog empirically keeps wakeups flowing.  Dumps go to /dev/null.
faulthandler.dump_traceback_later(300, repeat=True, file=open(os.devnull, "w"))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
