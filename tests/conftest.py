"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the standard JAX idiom for
testing pjit/shard_map without a pod — SURVEY.md section 4). This machine's
sitecustomize force-selects a TPU-tunnel PJRT plugin ("axon") via
jax.config, overriding JAX_PLATFORMS env; transfers through it block for
minutes. Overriding the config back to cpu here (before any backend
initializes — conftest imports run before test modules) pins tests to the
8-device CPU platform.
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))  # for numpy_oracle import


@pytest.fixture
def rng():
    return np.random.default_rng(0)
