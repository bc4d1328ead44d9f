"""Statistical noise tests: measured phase noise must match the
DispersionParameter predictions (analogue of
core_crypto/algorithms/test/noise_distribution/lwe_encryption_noise.rs)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu.core import rng
from tfhe_tpu.core.algorithms import (decrypt_lwe, encrypt_lwe,
                                      generate_lwe_secret_key)
from tfhe_tpu.core.params import TEST_PARAMS_SHORTINT as P

N_SAMPLES = 4096


def _measured_noise_std(std, seed):
    key = rng.key_from_seed(seed)
    sk = generate_lwe_secret_key(rng.fork(key, 0), P.lwe_dimension)
    zeros = jnp.zeros((N_SAMPLES,), dtype=jnp.uint64)
    ct = encrypt_lwe(rng.fork(key, 1), sk, zeros, std, 64)
    phase = np.asarray(decrypt_lwe(ct, sk, 64)).astype(np.int64).astype(np.float64)
    return phase


def test_lwe_noise_variance_matches_prediction():
    std = 2.0 ** 40
    phase = _measured_noise_std(std, seed=91)
    measured = phase.std()
    # chi-square-ish bound: for 4096 samples the sample std should be within
    # ~5% of the true std with overwhelming probability
    assert abs(measured - std) / std < 0.1, (measured, std)
    # and the mean must be ~0 (no encode bias): |mean| < 4*std/sqrt(n)
    assert abs(phase.mean()) < 5 * std / np.sqrt(N_SAMPLES)


def test_lwe_noise_is_gaussian_shaped():
    """Moment check: kurtosis of a gaussian is 3."""
    std = 2.0 ** 40
    phase = _measured_noise_std(std, seed=92)
    z = phase / phase.std()
    kurt = (z ** 4).mean()
    assert 2.6 < kurt < 3.4, kurt


def test_zero_noise_is_exact():
    phase = _measured_noise_std(0.0, seed=93)
    assert (phase == 0).all()


def test_deterministic_encryption_same_seed():
    a = _measured_noise_std(2.0 ** 30, seed=94)
    b = _measured_noise_std(2.0 ** 30, seed=94)
    np.testing.assert_array_equal(a, b)
