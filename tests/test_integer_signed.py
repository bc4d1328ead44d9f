"""Signed comparisons, abs, overflow flags, encrypted-amount shifts
(the analogue of integer radix_parallel tests_signed / shift tests)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu import integer
from tfhe_tpu.core.params import TEST_PARAMS_SHORTINT

NB = 2  # 4-bit values: signed range [-8, 8)


@pytest.fixture(scope="module")
def skeys():
    return integer.gen_keys(TEST_PARAMS_SHORTINT, num_blocks=NB, seed=95)


A = np.array([-8, -3, 0, 5, 7])
B = np.array([-4, 2, -1, 5, -7])


def test_signed_comparisons(skeys):
    ck, sk = skeys
    ca = ck.encrypt_signed(jnp.asarray(A), seed=1)
    cb = ck.encrypt_signed(jnp.asarray(B), seed=2)
    for fn, op in [(sk.lt_signed, np.less), (sk.le_signed, np.less_equal),
                   (sk.gt_signed, np.greater), (sk.ge_signed, np.greater_equal)]:
        got = np.asarray(ck.key.decrypt(fn(ca, cb).block))
        np.testing.assert_array_equal(got, op(A, B).astype(np.uint64),
                                      err_msg=fn.__name__)


def test_signed_min_max_abs(skeys):
    ck, sk = skeys
    ca = ck.encrypt_signed(jnp.asarray(A), seed=3)
    cb = ck.encrypt_signed(jnp.asarray(B), seed=4)
    mn = integer.SignedRadixCiphertext(blocks=sk.min_signed(ca, cb).blocks)
    mx = integer.SignedRadixCiphertext(blocks=sk.max_signed(ca, cb).blocks)
    np.testing.assert_array_equal(ck.decrypt_signed(mn), np.minimum(A, B))
    np.testing.assert_array_equal(ck.decrypt_signed(mx), np.maximum(A, B))
    ab = integer.SignedRadixCiphertext(blocks=sk.abs_signed(ca).blocks)
    # -8 stays -8 in 4-bit two's complement
    expect = np.where(A == -8, -8, np.abs(A))
    np.testing.assert_array_equal(ck.decrypt_signed(ab), expect)


def test_overflowing_add(skeys):
    ck, sk = skeys
    a = np.array([15, 7, 8])
    b = np.array([1, 7, 9])
    ca, cb = ck.encrypt(jnp.asarray(a), seed=5), ck.encrypt(jnp.asarray(b), seed=6)
    s, ov = sk.unsigned_overflowing_add(ca, cb)
    np.testing.assert_array_equal(ck.decrypt(s), (a + b) % 16)
    np.testing.assert_array_equal(np.asarray(ck.key.decrypt(ov.block)),
                                  ((a + b) >= 16).astype(np.uint64))


def test_encrypted_shift(skeys):
    ck, sk = skeys
    a = np.array([9, 12, 3])
    amt = np.array([1, 2, 0])
    ca = ck.encrypt(jnp.asarray(a), seed=7)
    cs = ck.encrypt(jnp.asarray(amt), seed=8)
    np.testing.assert_array_equal(ck.decrypt(sk.left_shift(ca, cs)),
                                  (a << amt) % 16)
    np.testing.assert_array_equal(ck.decrypt(sk.right_shift(ca, cs)), a >> amt)


def test_signed_overflowing_add_sub(skeys):
    ck, sk = skeys
    ca = ck.encrypt_signed(jnp.asarray(A), seed=7)
    cb = ck.encrypt_signed(jnp.asarray(B), seed=8)
    s, ov = sk.signed_overflowing_add(ca, cb)
    wrapped = ((A + B + 8) % 16) - 8
    np.testing.assert_array_equal(ck.decrypt_signed(s), wrapped)
    np.testing.assert_array_equal(ck.decrypt_bool(ov),
                                  (A + B < -8) | (A + B > 7))
    d, ov2 = sk.signed_overflowing_sub(ca, cb)
    wrapped_d = ((A - B + 8) % 16) - 8
    np.testing.assert_array_equal(ck.decrypt_signed(d), wrapped_d)
    np.testing.assert_array_equal(ck.decrypt_bool(ov2),
                                  (A - B < -8) | (A - B > 7))


def test_signed_scalar_div_rem(skeys):
    ck, sk = skeys
    ca = ck.encrypt_signed(jnp.asarray(A), seed=9)
    for d in (1, 2, 3, -2):
        q, r = sk.signed_scalar_div_rem(ca, d)
        np.testing.assert_array_equal(ck.decrypt_signed(q),
                                      np.trunc(A / d).astype(np.int64),
                                      err_msg=f"d={d}")
        np.testing.assert_array_equal(ck.decrypt_signed(r),
                                      A - np.trunc(A / d).astype(np.int64) * d,
                                      err_msg=f"d={d}")


def test_arithmetic_right_shift(skeys):
    ck, sk = skeys
    ca = ck.encrypt_signed(jnp.asarray(A), seed=10)
    for sh in (1, 2):
        out = sk.scalar_right_shift_arithmetic(ca, sh)
        np.testing.assert_array_equal(ck.decrypt_signed(out), A >> sh,
                                      err_msg=f"sh={sh}")


def test_signed_scalar_comparisons(skeys):
    ck, sk = skeys
    ca = ck.encrypt_signed(jnp.asarray(A), seed=11)
    for fn, op in [(sk.scalar_lt_signed, np.less), (sk.scalar_le_signed, np.less_equal),
                   (sk.scalar_gt_signed, np.greater), (sk.scalar_ge_signed, np.greater_equal)]:
        got = ck.decrypt_bool(fn(ca, -2))
        np.testing.assert_array_equal(got, op(A, -2))


def test_signed_div_rem(skeys):
    ck, sk = skeys
    a = np.array([-7, -7, 7, 7, -8, 5])
    b = np.array([2, -2, -2, 2, 3, -5])
    ca = ck.encrypt_signed(jnp.asarray(a), seed=21)
    cb = ck.encrypt_signed(jnp.asarray(b), seed=22)
    q, r = sk.signed_div_rem(ca, cb)
    # truncating semantics (like Rust's / and %)
    expect_q = np.fix(a / b).astype(np.int64)
    expect_r = a - expect_q * b
    np.testing.assert_array_equal(ck.decrypt_signed(q), expect_q)
    np.testing.assert_array_equal(ck.decrypt_signed(r), expect_r)
    # the generic div_rem dispatches signed operands
    q2, _ = sk.div_rem(ca, cb)
    np.testing.assert_array_equal(ck.decrypt_signed(q2), expect_q)


def test_signed_div_rem_floor(skeys):
    ck, sk = skeys
    a = np.array([-7, -7, 7, 7, 6])
    b = np.array([2, -2, -2, 2, 3])
    ca = ck.encrypt_signed(jnp.asarray(a), seed=23)
    cb = ck.encrypt_signed(jnp.asarray(b), seed=24)
    q, r = sk.signed_div_rem_floor(ca, cb)
    np.testing.assert_array_equal(ck.decrypt_signed(q), a // b)
    np.testing.assert_array_equal(ck.decrypt_signed(r), a % b)
