"""Test configuration: run on a virtual 8-device CPU mesh.

The reference runs its suite on CPU with a disk key cache; here small
insecure parameter sets (core/params.py TEST_PARAMS_*) keep unit tests fast,
and an 8-device host-platform mesh stands in for a TPU slice for the
sharding tests (SURVEY.md §4 "TPU build implication").

Must run before any jax computation: forces the CPU platform (the axon TPU
plugin registers itself via sitecustomize) and 8 virtual devices.
"""
import os
import resource

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

# XLA's CPU compiler sporadically SEGFAULTs on deep graphs (vmapped threefry
# keygen, the sha256_fhe gate stream) with the default 8 MB thread stack.
# IMPORTANT: the limit must be a LARGE FINITE value, not RLIM_INFINITY —
# per pthread_create(3), a finite soft RLIMIT_STACK sets the default stack
# of new threads, while "unlimited" falls back to the 8 MiB default, so the
# old infinity setting never actually enlarged XLA's compile threads.
try:
    resource.setrlimit(resource.RLIMIT_STACK,
                       (512 * 1024 * 1024, resource.RLIM_INFINITY))
except (ValueError, OSError):
    pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# The environment's persistent compilation cache holds XLA:CPU AOT blobs
# compiled on a DIFFERENT machine type (the loader itself warns "could lead
# to execution errors such as SIGILL") — reading them segfaults long CPU
# runs (observed deterministically in the sha256 full-message test, inside
# compilation_cache.get_executable_and_time).  CPU compiles are sub-second;
# the suite only needs the in-process jit cache.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA's CPU backend segfaults in backend_compile once enough compiled
    programs accumulate in one process (deterministic: a fresh large compile
    right after the trivium module dies; the same compile in a fresh process
    is fine).  Dropping the jit caches between modules keeps the long
    single-process suite (`pytest tests/ -x -q`) under the threshold."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rs():
    return np.random.RandomState(1234)
