"""Test configuration: run everything on the CPU backend with 8 virtual
devices so mesh/sharding tests emulate an 8-chip ICI slice without hardware
(SURVEY.md §4: the TPU-world analog of multi-node-without-a-cluster).

The shell environment pins ``JAX_PLATFORMS=axon`` (remote-TPU tunnel) and
pytest's plugin auto-load imports jax before this file runs, so the env var
alone is not enough — ``jax.config.update`` forces the CPU backend before any
backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(6210)
