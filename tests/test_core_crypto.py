"""Core-crypto algorithm tests (the analogue of
core_crypto/algorithms/test/): decomposition, LWE/GLWE round trips,
keyswitch, external product, blind rotation, sample extraction, PBS."""
import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu.core import rng
from tfhe_tpu.core.algorithms import *  # noqa: F403
from tfhe_tpu.core.algorithms.bootstrap import (external_product_accumulate,
                                                external_product_num_primes,
                                                modulus_switch)
from tfhe_tpu.core.decomposition import recompose, signed_decompose
from tfhe_tpu.core.entities import GlweCiphertext, LweCiphertext
from tfhe_tpu.core.params import (TEST_PARAMS_BOOLEAN, TEST_PARAMS_SHORTINT,
                                  DecompParams)
from tfhe_tpu.core.poly import get_plan, ntt_forward

P = TEST_PARAMS_SHORTINT
LOG_Q = 64
DELTA = np.uint64(1) << np.uint64(59)  # 2 bits msg + 2 bits carry + padding


@pytest.fixture(scope="module")
def keys():
    root = rng.key_from_seed(99)
    ks = rng.split(root, 6)
    lwe_sk = generate_lwe_secret_key(ks[0], P.lwe_dimension)
    glwe_sk = generate_glwe_secret_key(ks[1], P.glwe_dimension, P.polynomial_size)
    big_sk = glwe_sk.as_lwe_secret_key()
    ksk = generate_keyswitch_key(ks[2], big_sk, lwe_sk, P.ks_decomp,
                                 P.lwe_noise_std, LOG_Q)
    bsk_std = generate_bootstrap_key(ks[3], lwe_sk, glwe_sk, P.pbs_decomp,
                                     P.glwe_noise_std, LOG_Q)
    npr = external_product_num_primes(P.polynomial_size, P.glwe_size,
                                      P.pbs_decomp, LOG_Q)
    bsk = bootstrap_key_to_ntt(bsk_std, LOG_Q, npr)
    return dict(lwe_sk=lwe_sk, glwe_sk=glwe_sk, big_sk=big_sk, ksk=ksk,
                bsk=bsk, enc_keys=rng.split(ks[4], 16))


def round_msg(phase, delta=DELTA, mod=32):
    return np.asarray((phase + (delta >> np.uint64(1))) // delta) % mod


def test_signed_decompose_bounds(rs):
    d = DecompParams(4, 3)
    x = jnp.asarray(rs.randint(0, 1 << 63, 64).astype(np.uint64))
    digits = np.asarray(signed_decompose(x, d, 64))
    assert digits.max() <= 8 and digits.min() >= -8
    rec = recompose(jnp.asarray(digits), d, 64)
    err = np.abs(np.asarray((rec - x).astype(np.int64)))
    assert err.max() <= 1 << (64 - 12)  # rounding to q/B^L


def test_lwe_roundtrip(keys):
    msgs = jnp.arange(16, dtype=jnp.uint64) * DELTA
    ct = encrypt_lwe(keys["enc_keys"][0], keys["lwe_sk"], msgs,
                     P.lwe_noise_std, LOG_Q)
    assert (round_msg(decrypt_lwe(ct, keys["lwe_sk"], LOG_Q)) == np.arange(16) % 32).all()


def test_lwe_linear_ops(keys):
    a = encrypt_lwe(keys["enc_keys"][1], keys["lwe_sk"], jnp.uint64(3) * DELTA,
                    P.lwe_noise_std, LOG_Q)
    b = encrypt_lwe(keys["enc_keys"][2], keys["lwe_sk"], jnp.uint64(5) * DELTA,
                    P.lwe_noise_std, LOG_Q)
    assert round_msg(decrypt_lwe(lwe_add(a, b), keys["lwe_sk"], LOG_Q)) == 8
    assert round_msg(decrypt_lwe(lwe_sub(b, a), keys["lwe_sk"], LOG_Q)) == 2
    assert round_msg(decrypt_lwe(lwe_mul_cleartext(a, 4), keys["lwe_sk"], LOG_Q)) == 12
    assert round_msg(decrypt_lwe(lwe_add_plaintext(a, jnp.uint64(2) * DELTA),
                                 keys["lwe_sk"], LOG_Q)) == 5


def test_glwe_roundtrip(keys):
    pts = (jnp.arange(P.polynomial_size, dtype=jnp.uint64) % 7) * DELTA
    ct = encrypt_glwe(keys["enc_keys"][3], keys["glwe_sk"], pts,
                      P.glwe_noise_std, LOG_Q)
    dec = decrypt_glwe(ct, keys["glwe_sk"], LOG_Q)
    assert (round_msg(dec) == np.arange(P.polynomial_size) % 7).all()


def test_keyswitch(keys):
    msgs = jnp.arange(8, dtype=jnp.uint64) * DELTA
    ct = encrypt_lwe(keys["enc_keys"][4], keys["big_sk"], msgs,
                     P.glwe_noise_std, LOG_Q)
    small = keyswitch_lwe(ct, keys["ksk"], LOG_Q)
    assert small.lwe_dimension == P.lwe_dimension
    assert (round_msg(decrypt_lwe(small, keys["lwe_sk"], LOG_Q)) == np.arange(8)).all()


def test_sample_extract(keys):
    pts = (jnp.arange(P.polynomial_size, dtype=jnp.uint64) % 13) * DELTA
    ct = encrypt_glwe(keys["enc_keys"][5], keys["glwe_sk"], pts,
                      P.glwe_noise_std, LOG_Q)
    for idx in [0, 1, 100, P.polynomial_size - 1]:
        ext = sample_extract(ct, idx)
        assert round_msg(decrypt_lwe(ext, keys["big_sk"], LOG_Q)) == idx % 13


def test_external_product(keys):
    npr = keys["bsk"].data.shape[1]
    pts = (jnp.arange(P.polynomial_size, dtype=jnp.uint64) % 5) * DELTA
    gct = encrypt_glwe(keys["enc_keys"][6], keys["glwe_sk"], pts,
                       P.glwe_noise_std, LOG_Q)
    plan = get_plan(P.polynomial_size, npr)
    for bit in [0, 1]:
        ggsw = encrypt_constant_ggsw(keys["enc_keys"][7 + bit], keys["glwe_sk"],
                                     jnp.int32(bit), P.pbs_decomp,
                                     P.glwe_noise_std, LOG_Q)
        hat = ntt_forward(plan, ggsw.data)
        hat = jnp.moveaxis(hat, -2, 0).reshape(
            npr, P.pbs_decomp.level * P.glwe_size, P.glwe_size, P.polynomial_size)
        acc = jnp.zeros((P.glwe_size, P.polynomial_size), jnp.uint64)
        out = external_product_accumulate(acc, gct.data, hat.astype(jnp.uint32),
                                          P.pbs_decomp, LOG_Q)
        dec = round_msg(decrypt_glwe(GlweCiphertext(data=out), keys["glwe_sk"], LOG_Q))
        expect = (np.arange(P.polynomial_size) % 5) * bit
        np.testing.assert_array_equal(dec, expect)


def test_gsw_external_product(keys):
    """GSW ⊡ LWE external product selects m·pt (reference leaves
    gsw_ciphertext.rs unimplemented; algorithms/gsw.py makes it real)."""
    from tfhe_tpu.core.algorithms.gsw import (cmux_lwe, encrypt_constant_gsw,
                                              gsw_external_product)
    msgs = jnp.arange(8, dtype=jnp.uint64) * DELTA
    ct = encrypt_lwe(keys["enc_keys"][11], keys["lwe_sk"], msgs,
                     P.lwe_noise_std, LOG_Q)
    # GSW rows need GLWE-grade noise: base-23 digits scale row noise by ~2^22
    for bit in [0, 1]:
        gsw = encrypt_constant_gsw(keys["enc_keys"][12 + bit], keys["lwe_sk"],
                                   jnp.int32(bit), P.pbs_decomp,
                                   P.glwe_noise_std, LOG_Q)
        out = gsw_external_product(gsw, ct, LOG_Q)
        dec = round_msg(decrypt_lwe(out, keys["lwe_sk"], LOG_Q))
        np.testing.assert_array_equal(dec, (np.arange(8) * bit) % 32)
    # cmux: bit=1 selects ct over the zero ciphertext
    gsw1 = encrypt_constant_gsw(keys["enc_keys"][13], keys["lwe_sk"],
                                jnp.int32(1), P.pbs_decomp,
                                P.glwe_noise_std, LOG_Q)
    zero = encrypt_lwe(keys["enc_keys"][14], keys["lwe_sk"],
                       jnp.zeros(8, dtype=jnp.uint64), P.lwe_noise_std, LOG_Q)
    sel = cmux_lwe(gsw1, zero, ct, LOG_Q)
    np.testing.assert_array_equal(
        round_msg(decrypt_lwe(sel, keys["lwe_sk"], LOG_Q)), np.arange(8))


def test_pbs_lut(keys):
    """Full PBS evaluates an arbitrary LUT on every message (the shortint
    PARAM-style correctness gate, SURVEY.md §7.2 step 4)."""
    p_space = 16  # message*carry space, 1 padding bit
    n_poly = P.polynomial_size
    box = n_poly // p_space
    f = lambda x: (3 * x + 1) % p_space
    lut_vals = jnp.repeat(jnp.asarray([f(i) for i in range(p_space)], dtype=jnp.uint64),
                          box) * DELTA
    # half-box negacyclic shift so rounding windows center on each message
    lut_poly = jnp.roll(lut_vals, -(box // 2))
    lut_poly = lut_poly.at[-(box // 2):].multiply(jnp.uint64(0) - jnp.uint64(1))
    acc = trivial_glwe(lut_poly, P.glwe_dimension, LOG_Q)

    msgs = jnp.arange(p_space, dtype=jnp.uint64) * DELTA
    ct = encrypt_lwe(keys["enc_keys"][9], keys["lwe_sk"], msgs,
                     P.lwe_noise_std, LOG_Q)
    out = programmable_bootstrap(ct, acc, keys["bsk"], LOG_Q)
    dec = round_msg(decrypt_lwe(out, keys["big_sk"], LOG_Q), mod=p_space)
    np.testing.assert_array_equal(dec, [f(i) for i in range(p_space)])
