"""Test config: force CPU with 8 virtual devices so mesh/sharding tests run
without TPU hardware (SURVEY.md §4)."""

import os

# NB: the environment's sitecustomize imports jax at interpreter startup, so
# setting JAX_PLATFORMS via os.environ here is too late; use jax.config (the
# backend client is created lazily, so this still wins if done before any op).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
