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


def test_pbs_output_noise_matches_model():
    """PBS output phase noise follows the standard blind-rotation model
        Var_out = n·l·(k+1)·N·(B²/12)·σ_bsk² + n·(kN+1)/2·(q²·B^{-2l})/12
    (external-product MAC noise + gadget-decomposition rounding tail;
    reference core_crypto noise_distribution tests gate the same quantity —
    here with ZERO transform noise because the CRT-NTT is exact, unlike the
    reference's f64 FFT)."""
    from tfhe_tpu.core.algorithms import (bootstrap_key_to_ntt,
                                          generate_bootstrap_key,
                                          programmable_bootstrap, trivial_glwe)
    from tfhe_tpu.core.algorithms.bootstrap import external_product_num_primes
    from tfhe_tpu.core.algorithms.encryption import generate_glwe_secret_key

    n_samples = 1024
    key = rng.key_from_seed(97)
    lwe_sk = generate_lwe_secret_key(rng.fork(key, 0), P.lwe_dimension)
    glwe_sk = generate_glwe_secret_key(rng.fork(key, 1), P.glwe_dimension,
                                       P.polynomial_size)
    big_sk = glwe_sk.as_lwe_secret_key()
    std_bsk = P.glwe_modular_std_dev * 2.0 ** 64
    bsk_std = generate_bootstrap_key(rng.fork(key, 2), lwe_sk, glwe_sk,
                                     P.pbs_decomp, P.glwe_modular_std_dev, 64)
    npr = external_product_num_primes(P.polynomial_size, P.glwe_size,
                                      P.pbs_decomp, 64)
    bsk = bootstrap_key_to_ntt(bsk_std, 64, npr)

    # box-encoded LUT of the constant function f == 1 (same construction as
    # shortint generate_lookup_table: boxes + half-box roll + negacyclic
    # tail) — small mod-switch offsets stay inside a box, so the output
    # phase is delta + blind-rotation noise (a bare constant polynomial
    # would NOT work: negacyclic rotation flips the sign of wrapped
    # coefficients)
    p_space = P.message_modulus * P.carry_modulus
    box = P.polynomial_size // p_space
    delta = np.uint64(2 ** 64 // (2 * p_space))
    poly = np.repeat(np.full(p_space, 1, dtype=np.uint64) * delta, box)
    poly = np.roll(poly, -(box // 2))
    poly[-(box // 2):] = np.uint64(0) - poly[-(box // 2):]
    acc = trivial_glwe(jnp.asarray(poly), P.glwe_dimension, 64)

    zeros = jnp.zeros((n_samples,), dtype=jnp.uint64)
    ct = encrypt_lwe(rng.fork(key, 3), lwe_sk, zeros,
                     P.lwe_modular_std_dev * 2.0 ** 64, 64)
    out = programmable_bootstrap(ct, acc, bsk, 64)
    phase = np.asarray(decrypt_lwe(out, big_sk, 64))
    err = (phase - delta).astype(np.int64).astype(np.float64)

    n, l = P.lwe_dimension, P.pbs_level
    k, N = P.glwe_dimension, P.polynomial_size
    B = 2.0 ** P.pbs_base_log
    # MAC term: every step sums l(k+1)N GGSW-noise products.  Rounding
    # tail: the gadget-decomposition residual only materializes on s_i = 1
    # steps (expected n/2 — for s_i = 0 the GGSW message is zero) and
    # couples to the binary GLWE key (E[s²] = 1/2 per coefficient).
    var_pred = (n * l * (k + 1) * N * (B ** 2 / 12.0) * std_bsk ** 2
                + (n / 2.0) * (k * N / 2.0 + 1)
                * (2.0 ** 128) * B ** (-2 * l) / 12.0)
    ratio = err.var() / var_pred
    assert 0.5 < ratio < 2.0, (err.std(), np.sqrt(var_pred), ratio)
    # the constant LUT decodes correctly for every sample (sanity)
    assert np.all(np.abs(err) < float(delta) / 2)
