"""128-bit ciphertext-modulus path (the reference's fft_impl/fft128 role):
two-limb torus arithmetic, exact wide-CRT polynomial products, LWE/GLWE
round trips, keyswitch, and the full u128 PBS."""
import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu.core import rng, u128
from tfhe_tpu.core.algorithms import (generate_glwe_secret_key,
                                      generate_lwe_secret_key)
from tfhe_tpu.core.algorithms import pbs128 as M
from tfhe_tpu.core.decomposition import signed_decompose128
from tfhe_tpu.core.params import DecompParams
from tfhe_tpu.core.poly.ntt import negacyclic_polymul128

Q128 = 1 << 128


def rand128(rs, shape):
    hi = rs.randint(0, 1 << 63, shape).astype(np.uint64) * np.uint64(2) \
        + rs.randint(0, 2, shape).astype(np.uint64)
    lo = rs.randint(0, 1 << 63, shape).astype(np.uint64) * np.uint64(2) \
        + rs.randint(0, 2, shape).astype(np.uint64)
    return u128.make128(jnp.asarray(hi), jnp.asarray(lo))


def test_u128_arithmetic(rs):
    a = rand128(rs, (32,))
    b = rand128(rs, (32,))
    ai, bi = u128.to_python_ints(a), u128.to_python_ints(b)
    np.testing.assert_array_equal(u128.to_python_ints(u128.add128(a, b)),
                                  (ai + bi) % Q128)
    np.testing.assert_array_equal(u128.to_python_ints(u128.sub128(a, b)),
                                  (ai - bi) % Q128)
    np.testing.assert_array_equal(u128.to_python_ints(u128.neg128(a)),
                                  (-ai) % Q128)
    np.testing.assert_array_equal(u128.to_python_ints(u128.sum128(a, axis=0)),
                                  sum(ai) % Q128)
    d = jnp.asarray(rs.randint(-(1 << 30), 1 << 30, 32))
    got = u128.to_python_ints(u128.mul_small_signed_by_128(d, a))
    want = np.array([(int(x) * v) % Q128 for x, v in zip(np.asarray(d), ai)],
                    dtype=object)
    np.testing.assert_array_equal(got, want)


def test_mul_u64_by_u128(rs):
    t = jnp.asarray(rs.randint(0, 1 << 32, 16, dtype=np.int64).astype(np.uint64))
    c = (0xDEADBEEFCAFEBABE << 64) | 0xFEEDFACE01234567
    got = u128.to_python_ints(u128.mul_u64_by_u128(t, c >> 64, c & ((1 << 64) - 1)))
    want = np.array([(int(x) * c) % Q128 for x in np.asarray(t)], dtype=object)
    np.testing.assert_array_equal(got, want)


def test_polymul128_exact(rs):
    n = 64
    a = rand128(rs, (n,))
    b = rs.randint(-8, 9, n).astype(np.int64)
    ai = u128.to_python_ints(a)
    ref = [0] * n
    for i in range(n):
        ai_s = int(ai[i]) - Q128 if int(ai[i]) >= Q128 // 2 else int(ai[i])
        for j in range(n):
            k = i + j
            v = ai_s * int(b[j])
            if k < n:
                ref[k] += v
            else:
                ref[k - n] -= v
    ref = np.array([x % Q128 for x in ref], dtype=object)
    out = negacyclic_polymul128(a, jnp.asarray(b), log_bound=128 + 6 + 4)
    np.testing.assert_array_equal(u128.to_python_ints(out), ref)


def test_decompose128_recompose(rs):
    d = DecompParams(base_log=12, level=3)
    x = rand128(rs, (64,))
    digits = np.asarray(signed_decompose128(x, d))
    assert digits.max() <= 1 << 11 and digits.min() >= -(1 << 11)
    rec = sum(int(digits[i][l]) * (1 << (128 - 12 * (l + 1)))
              for i in [0] for l in range(3)) % Q128
    err = (rec - int(u128.to_python_ints(x)[0])) % Q128
    err = min(err, Q128 - err)
    assert err <= 1 << (128 - 36)


@pytest.fixture(scope="module")
def keys128():
    root = rng.key_from_seed(128)
    ks = rng.split(root, 8)
    lwe_sk = generate_lwe_secret_key(ks[0], 16)
    glwe_sk = generate_glwe_secret_key(ks[1], 1, 256)
    big_sk = glwe_sk.as_lwe_secret_key()
    pbs_decomp = DecompParams(base_log=12, level=1)
    ks_decomp = DecompParams(base_log=8, level=4)
    bsk_std = M.generate_bootstrap_key128(ks[2], lwe_sk, glwe_sk, pbs_decomp,
                                          2.0 ** 60)
    bsk = M.bootstrap_key128_to_ntt(bsk_std, pbs_decomp)
    ksk = M.generate_keyswitch_key128(ks[3], big_sk, lwe_sk, ks_decomp,
                                      2.0 ** 60)
    return dict(lwe_sk=lwe_sk, glwe_sk=glwe_sk, big_sk=big_sk, bsk=bsk,
                ksk=ksk, enc=rng.split(ks[4], 8))


DELTA128 = 1 << 123      # 4-bit messages + padding bit at a 2^128 modulus


def msgs128(vals):
    return u128.make128(
        jnp.asarray([(v * DELTA128) >> 64 for v in vals], dtype=jnp.uint64),
        jnp.asarray([(v * DELTA128) & ((1 << 64) - 1) for v in vals],
                    dtype=jnp.uint64))


def round_msg128(phase, mod=32):
    ints = u128.to_python_ints(phase)
    return np.array([int((int(v) + DELTA128 // 2) // DELTA128) % mod
                     for v in ints.ravel()]).reshape(ints.shape)


def test_lwe128_roundtrip(keys128):
    vals = list(range(8))
    ct = M.encrypt_lwe128(keys128["enc"][0], keys128["lwe_sk"], msgs128(vals),
                          2.0 ** 70)
    phase = M.decrypt_lwe128(ct, keys128["lwe_sk"])
    np.testing.assert_array_equal(round_msg128(phase), vals)


def test_glwe128_roundtrip(keys128):
    n = 256
    vals = [(3 * j) % 16 for j in range(n)]
    pts = msgs128(vals)
    ct = M.encrypt_glwe128(keys128["enc"][1], keys128["glwe_sk"], pts, 2.0 ** 60)
    phase = M.decrypt_glwe128(ct, keys128["glwe_sk"])
    np.testing.assert_array_equal(round_msg128(phase), vals)


def test_keyswitch128(keys128):
    vals = [1, 7, 12, 15]
    ct = M.encrypt_lwe128(keys128["enc"][2], keys128["big_sk"], msgs128(vals),
                          2.0 ** 60)
    out = M.keyswitch128(ct, keys128["ksk"])
    assert out.lwe_dimension == 16
    phase = M.decrypt_lwe128(out, keys128["lwe_sk"])
    np.testing.assert_array_equal(round_msg128(phase), vals)


def test_pbs128_lut(keys128):
    """Full 128-bit PBS applies an arbitrary LUT and resets noise
    (reference programmable_bootstrap_f128_lwe_ciphertext)."""
    n = 256
    p_space = 16

    def f(x):
        return (3 * x + 1) % p_space

    box = n // p_space
    lut_vals = np.repeat([f(i) for i in range(p_space)], box)
    lut_ints = [(int(v) * DELTA128) % Q128 for v in lut_vals]
    lut_ints = lut_ints[box // 2:] + [(-x) % Q128 for x in lut_ints[:box // 2]]
    lut = u128.make128(
        jnp.asarray([x >> 64 for x in lut_ints], dtype=jnp.uint64),
        jnp.asarray([x & ((1 << 64) - 1) for x in lut_ints], dtype=jnp.uint64))
    acc = M.trivial_glwe128(lut, 1)

    vals = [0, 3, 7, 15]
    ct = M.encrypt_lwe128(keys128["enc"][3], keys128["lwe_sk"], msgs128(vals),
                          2.0 ** 70)
    out = M.programmable_bootstrap128(ct, acc, keys128["bsk"])
    phase = M.decrypt_lwe128(out, keys128["big_sk"])
    np.testing.assert_array_equal(round_msg128(phase, mod=p_space),
                                  [f(v) for v in vals])
