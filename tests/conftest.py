"""Test configuration: force CPU with 8 virtual devices.

Mirrors SURVEY.md §4: kernels are tested on CPU against the numpy oracle;
multi-device sharding logic is exercised on a virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) so the suite runs
anywhere, while the real TPU path shares the exact same code.
"""

import os

_USE_TPU = os.environ.get("GSTK_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if not _USE_TPU:
    # The environment may pin JAX_PLATFORMS to a TPU plugin (e.g. axon) via
    # sitecustomize; the config update wins over the env var. Set
    # GSTK_TEST_TPU=1 to run hardware tests (tests/test_tpu_smoke.py).
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
