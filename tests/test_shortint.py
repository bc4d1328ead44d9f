"""Shortint op-family tests against the clear model over all message pairs —
the analogue of the reference's parametrized shortint matrix
(shortint/server_key/tests/shortint.rs:32-121), on the fast insecure
TEST_PARAMS_SHORTINT set (2-bit message, 2-bit carry)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.core.params import TEST_PARAMS_SHORTINT

M = TEST_PARAMS_SHORTINT.message_modulus


@pytest.fixture(scope="module")
def skeys():
    return shortint.gen_keys(TEST_PARAMS_SHORTINT, seed=5)


def enc_pairs(ck):
    """All (a, b) message pairs as two batched ciphertexts."""
    a = np.repeat(np.arange(M), M)
    b = np.tile(np.arange(M), M)
    return (a, b, ck.encrypt(jnp.asarray(a), seed=11), ck.encrypt(jnp.asarray(b), seed=12))


def test_encrypt_decrypt(skeys):
    ck, _ = skeys
    msgs = jnp.arange(M, dtype=jnp.uint64)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(ck.encrypt(msgs, seed=3))),
                                  np.arange(M))


def test_trivial(skeys):
    ck, _ = skeys
    ct = ck.trivial_encrypt(jnp.asarray([1, 2]))
    np.testing.assert_array_equal(np.asarray(ck.decrypt(ct)), [1, 2])


def test_apply_lookup_table(skeys):
    ck, sk = skeys
    msgs = jnp.arange(M, dtype=jnp.uint64)
    ct = ck.encrypt(msgs, seed=7)
    lut = sk.generate_lookup_table(lambda x: (3 * x + 1) % M)
    out = sk.apply_lookup_table(ct, lut)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(out)),
                                  (3 * np.arange(M) + 1) % M)


def test_add_and_carry(skeys):
    ck, sk = skeys
    a, b, ca, cb = enc_pairs(ck)
    s = sk.unchecked_add(ca, cb)
    np.testing.assert_array_equal(
        np.asarray(ck.decrypt_message_and_carry(s)), a + b)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.add(ca, cb))),
                                  (a + b) % M)
    np.testing.assert_array_equal(
        np.asarray(ck.decrypt(sk.carry_extract(s))), (a + b) // M)
    np.testing.assert_array_equal(
        np.asarray(ck.decrypt(sk.message_extract(s))), (a + b) % M)


def test_neg_sub(skeys):
    ck, sk = skeys
    a, b, ca, cb = enc_pairs(ck)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.neg(ca))), (-a) % M)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.sub(ca, cb))),
                                  (a - b) % M)


def test_mul(skeys):
    ck, sk = skeys
    a, b, ca, cb = enc_pairs(ck)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.mul(ca, cb))),
                                  (a * b) % M)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.unchecked_mul_msb(ca, cb))),
                                  (a * b) // M)


def test_div(skeys):
    ck, sk = skeys
    a, b, ca, cb = enc_pairs(ck)
    expect = np.where(b != 0, a // np.maximum(b, 1), M - 1) % M
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.div(ca, cb))), expect)


def test_bitwise(skeys):
    ck, sk = skeys
    a, b, ca, cb = enc_pairs(ck)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.bitand(ca, cb))), a & b)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.bitor(ca, cb))), a | b)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.bitxor(ca, cb))), a ^ b)


def test_comparisons(skeys):
    ck, sk = skeys
    a, b, ca, cb = enc_pairs(ck)
    for fn, op in [(sk.equal, np.equal), (sk.not_equal, np.not_equal),
                   (sk.greater, np.greater), (sk.less, np.less),
                   (sk.greater_or_equal, np.greater_equal),
                   (sk.less_or_equal, np.less_equal)]:
        np.testing.assert_array_equal(np.asarray(ck.decrypt(fn(ca, cb))),
                                      op(a, b).astype(np.uint64))


def test_scalar_ops(skeys):
    ck, sk = skeys
    a = np.arange(M)
    ca = ck.encrypt(jnp.asarray(a), seed=13)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.scalar_add(ca, 2))),
                                  (a + 2) % M)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.scalar_sub(ca, 1))),
                                  (a - 1) % M)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.scalar_mul(ca, 3))),
                                  (a * 3) % M)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.scalar_left_shift(ca, 1))),
                                  (a << 1) % M)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.scalar_right_shift(ca, 1))),
                                  a >> 1)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.scalar_equal(ca, 2))),
                                  (a == 2).astype(np.uint64))


def test_smart_ops_chain(skeys):
    """Repeated smart_adds must auto-propagate carries and stay correct."""
    ck, sk = skeys
    a = np.array([1, 2, 3, 1])
    ct = ck.encrypt(jnp.asarray(a), seed=14)
    acc = ct
    total = a.copy()
    for _ in range(4):
        acc = sk.smart_add(acc, ct)
        total = total + a
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.message_extract(acc))),
                                  total % M)
