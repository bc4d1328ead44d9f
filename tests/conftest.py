"""Test configuration: run on a virtual 8-device CPU mesh.

The reference runs its suite on CPU with a disk key cache; here small
insecure parameter sets (core/params.py TEST_PARAMS_*) keep unit tests fast,
and an 8-device host-platform mesh stands in for a TPU slice for the
sharding tests (SURVEY.md §4 "TPU build implication").

Must run before any jax computation: forces the CPU platform (the axon TPU
plugin registers itself via sitecustomize) and 8 virtual devices.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rs():
    return np.random.RandomState(1234)
