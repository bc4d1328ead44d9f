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


def test_glwe_noise_variance_matches_prediction():
    """GLWE encryption phase noise per coefficient has std = the requested
    dispersion (reference noise_distribution tests cover GLWE the same way)."""
    from tfhe_tpu.core.algorithms import encrypt_glwe, decrypt_glwe
    from tfhe_tpu.core.algorithms.encryption import generate_glwe_secret_key
    std = 2.0 ** 40
    key = rng.key_from_seed(95)
    sk = generate_glwe_secret_key(rng.fork(key, 0), P.glwe_dimension,
                                  P.polynomial_size)
    zeros = jnp.zeros((16, P.polynomial_size), dtype=jnp.uint64)
    ct = encrypt_glwe(rng.fork(key, 1), sk, zeros, std, 64)
    phase = np.asarray(decrypt_glwe(ct, sk, 64)).astype(np.int64).astype(np.float64)
    measured = phase.std()
    assert abs(measured - std) / std < 0.1, (measured, std)
    assert abs(phase.mean()) < 5 * std / np.sqrt(phase.size)


def test_keyswitch_noise_matches_model():
    """Keyswitch output noise follows the standard model
        Var_out = Var_in + n_in·l·(B²/12)·σ_ksk² + (n_in/2)·(q²·B^{-2l})/12
    (decomposition MAC noise + rounding tail against binary keys) — the
    §4.3-style check that HOT LOOP 2 adds exactly the predicted noise."""
    from tfhe_tpu.core.algorithms import keyswitch
    from tfhe_tpu.core.algorithms.encryption import generate_keyswitch_key
    key = rng.key_from_seed(96)
    n_in, n_out = 256, P.lwe_dimension
    in_sk = generate_lwe_secret_key(rng.fork(key, 0), n_in)
    out_sk = generate_lwe_secret_key(rng.fork(key, 1), n_out)
    std_ksk = 2.0 ** 30
    std_in = 2.0 ** 34
    decomp = P.ks_decomp
    ksk = generate_keyswitch_key(rng.fork(key, 2), in_sk, out_sk, decomp,
                                 std_ksk, 64)
    zeros = jnp.zeros((N_SAMPLES,), dtype=jnp.uint64)
    ct = encrypt_lwe(rng.fork(key, 3), in_sk, zeros, std_in, 64)
    out = keyswitch.keyswitch_lwe(ct, ksk, 64)
    phase = np.asarray(decrypt_lwe(out, out_sk, 64)
                       ).astype(np.int64).astype(np.float64)
    B = 2.0 ** decomp.base_log
    l = decomp.level
    var_pred = (std_in ** 2
                + n_in * l * (B ** 2 / 12.0) * std_ksk ** 2
                + (n_in / 2.0) * (2.0 ** 128) * B ** (-2 * l) / 12.0)
    ratio = phase.var() / var_pred
    assert 0.7 < ratio < 1.4, (phase.std(), np.sqrt(var_pred), ratio)
