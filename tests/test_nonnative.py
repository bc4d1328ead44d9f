"""Non-native (custom) ciphertext-modulus layer
(reference: CiphertextModulus::Custom paths in lwe_encryption.rs /
lwe_linear_algebra.rs and SignedDecomposerNonNative, decomposer.rs:203)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_tpu.core import rng
from tfhe_tpu.core.algorithms import nonnative as nn
from tfhe_tpu.core.algorithms.encryption import generate_lwe_secret_key

GOLDILOCKS_ISH = (1 << 64) - (1 << 32) + 1     # the reference's doc modulus
Q_ODD_48 = (1 << 48) - 59
Q_POW2_63 = 1 << 63
ALL_Q = [GOLDILOCKS_ISH, Q_ODD_48, Q_POW2_63]


def test_closest_representable_reference_vector():
    # decomposer.rs:338-340 doc test, q = 2^64 - 2^32 + 1, B = 2^4, l = 3
    got = nn.closest_representable_custom_mod(
        jnp.asarray([16982820785129133100], dtype=jnp.uint64), 4, 3,
        GOLDILOCKS_ISH)
    assert int(got[0]) == 16983074190859960320


@pytest.mark.parametrize("q", ALL_Q)
def test_decompose_balanced_and_recomposes(q):
    base_log, level = 4, 3
    r = np.random.default_rng(7)
    xs = jnp.asarray(r.integers(0, q, size=64, dtype=np.uint64))
    terms = nn.decompose_custom_mod(xs, base_log, level, q)
    assert terms.shape == xs.shape + (level,)
    t = np.asarray(terms).astype(object)
    centered = np.where(t > q // 2, t - q, t)
    assert np.all(np.abs(centered) <= (1 << base_log) // 2)
    # Σ θ_i·floor(q/B^i) reproduces closest_representable up to the floored
    # radix slack: floor(q/B^i) − B^(l−i)·floor(q/B^l) ∈ [0, B^(l−i)), so the
    # total error is ≤ Σ|θ_i|·B^(l−i) ≤ (B/2)·(B^l−1)/(B−1)·B ≈ B^l
    # (negligible vs q; the reference calls these *approximate* summands)
    summands = np.asarray(
        nn.recomposition_summands_custom_mod(terms, base_log, level, q)
    ).astype(object)
    recomposed = summands.sum(axis=-1) % q
    closest = np.asarray(
        nn.closest_representable_custom_mod(xs, base_log, level, q)
    ).astype(object)
    diff = (recomposed - closest) % q
    diff = np.where(diff > q // 2, diff - q, diff)
    assert np.all(np.abs(diff) <= 2 * (1 << (base_log * level)))


@pytest.mark.parametrize("q", ALL_Q)
def test_encrypt_decrypt_roundtrip(q):
    p = 16                                   # plaintext modulus
    delta = q // (2 * p)
    key = rng.key_from_seed(5)
    sk = generate_lwe_secret_key(rng.fork(key, 0), 64)
    msgs = jnp.arange(32, dtype=jnp.uint64) % p
    pts = msgs * jnp.uint64(delta)
    ct = nn.encrypt_lwe_custom_mod(rng.fork(key, 1), sk, pts, 2.0 ** -25, q)
    assert np.all(np.asarray(ct.data).astype(object) < q)
    phase = np.asarray(nn.decrypt_lwe_custom_mod(ct, sk, q)).astype(object)
    dec = ((phase + delta // 2) % q) // delta % p
    assert np.array_equal(dec.astype(np.uint64), np.asarray(msgs))


def test_linear_algebra_custom_mod():
    q = Q_ODD_48
    p = 32
    delta = q // (2 * p)
    key = rng.key_from_seed(11)
    sk = generate_lwe_secret_key(rng.fork(key, 0), 64)
    a_m, b_m = 7, 9
    ct_a = nn.encrypt_lwe_custom_mod(rng.fork(key, 1), sk,
                                     jnp.uint64(a_m * delta), 2.0 ** -30, q)
    ct_b = nn.encrypt_lwe_custom_mod(rng.fork(key, 2), sk,
                                     jnp.uint64(b_m * delta), 2.0 ** -30, q)

    def dec(ct):
        phase = int(np.asarray(nn.decrypt_lwe_custom_mod(ct, sk, q)))
        return ((phase + delta // 2) // delta) % (2 * p)

    assert dec(nn.lwe_add_custom_mod(ct_a, ct_b, q)) == a_m + b_m
    assert dec(nn.lwe_sub_custom_mod(ct_b, ct_a, q)) == b_m - a_m
    assert dec(nn.lwe_neg_custom_mod(ct_a, q)) == (2 * p) - a_m
    assert dec(nn.lwe_plaintext_add_custom_mod(
        ct_a, jnp.uint64(3 * delta), q)) == a_m + 3
    assert dec(nn.lwe_cleartext_mul_custom_mod(ct_a, 3, q)) == 3 * a_m


@pytest.mark.parametrize("q", [GOLDILOCKS_ISH, Q_ODD_48])
def test_seeded_matches_direct(q):
    key = rng.key_from_seed(23)
    sk = generate_lwe_secret_key(rng.fork(key, 0), 32)
    pts = jnp.asarray([123456789, 5], dtype=jnp.uint64)
    enc_key = rng.fork(key, 1)
    direct = nn.encrypt_lwe_custom_mod(enc_key, sk, pts, 2.0 ** -30, q)
    bodies = nn.encrypt_seeded_lwe_custom_mod(enc_key, sk, pts, 2.0 ** -30, q)
    expanded = nn.decompress_seeded_lwe_custom_mod(enc_key, bodies, 32, q)
    assert np.array_equal(np.asarray(direct.data), np.asarray(expanded.data))
