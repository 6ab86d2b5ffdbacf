"""Test configuration: run the suite on CPU with 8 virtual devices.

Multi-chip sharding (mesh/pjit/psum) is tested the TPU way without a TPU
slice, per SURVEY.md section 4: force the host platform and fake 8 devices.

NOTE: this environment's axon TPU plugin overrides the ``JAX_PLATFORMS`` env
var (config ends up ``axon,cpu`` regardless), so the CPU platform must be
forced via ``jax.config.update`` before any backend initializes.  Going
through the axon tunnel makes every dispatch ~1s and intermittently stalls
for minutes — tests must never touch it.
"""

import faulthandler
import os

import jax

# DSNT_TEST_TPU=1 runs the suite on the real chip (e.g. to exercise the
# compiled Pallas kernels instead of interpreter mode); default is CPU with
# 8 virtual devices.
if os.environ.get("DSNT_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# Watchdog: dumps stacks if anything still stalls (evidence for env flakes).
faulthandler.dump_traceback_later(600, repeat=True, file=open(os.devnull, "w"))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
