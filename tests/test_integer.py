"""Radix integer tests against the clear model (the analogue of the
reference's integer matrix, integer/server_key/radix_parallel/tests_unsigned.rs),
on TEST_PARAMS_SHORTINT with 4 blocks of 2 bits (FheUint8-shaped)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu import integer
from tfhe_tpu.core.params import TEST_PARAMS_SHORTINT

NB = 4  # 4 blocks x 2 bits = 8-bit integers
MOD = 4 ** NB


@pytest.fixture(scope="module")
def ikeys():
    return integer.gen_keys(TEST_PARAMS_SHORTINT, num_blocks=NB, seed=9)


A = np.array([0, 7, 200, 255, 123])
B = np.array([0, 9, 100, 255, 231])


@pytest.fixture(scope="module")
def cts(ikeys):
    ck, _ = ikeys
    return ck.encrypt(jnp.asarray(A), seed=1), ck.encrypt(jnp.asarray(B), seed=2)


def test_encrypt_decrypt(ikeys):
    ck, _ = ikeys
    vals = jnp.asarray([0, 1, 255, 137])
    np.testing.assert_array_equal(ck.decrypt(ck.encrypt(vals, seed=3)),
                                  np.asarray(vals))


def test_add_sub_neg(ikeys, cts):
    ck, sk = ikeys
    ca, cb = cts
    np.testing.assert_array_equal(ck.decrypt(sk.add(ca, cb)), (A + B) % MOD)
    np.testing.assert_array_equal(ck.decrypt(sk.sub(ca, cb)), (A - B) % MOD)
    np.testing.assert_array_equal(ck.decrypt(sk.neg(ca)), (-A) % MOD)


def test_scalar_add_mul(ikeys, cts):
    ck, sk = ikeys
    ca, _ = cts
    np.testing.assert_array_equal(ck.decrypt(sk.scalar_add(ca, 100)),
                                  (A + 100) % MOD)
    np.testing.assert_array_equal(ck.decrypt(sk.scalar_sub(ca, 77)),
                                  (A - 77) % MOD)
    np.testing.assert_array_equal(ck.decrypt(sk.scalar_mul(ca, 5)),
                                  (A * 5) % MOD)


def test_mul(ikeys, cts):
    ck, sk = ikeys
    ca, cb = cts
    np.testing.assert_array_equal(ck.decrypt(sk.mul(ca, cb)), (A * B) % MOD)


def test_bitwise(ikeys, cts):
    ck, sk = ikeys
    ca, cb = cts
    np.testing.assert_array_equal(ck.decrypt(sk.bitand(ca, cb)), A & B)
    np.testing.assert_array_equal(ck.decrypt(sk.bitor(ca, cb)), A | B)
    np.testing.assert_array_equal(ck.decrypt(sk.bitxor(ca, cb)), A ^ B)
    np.testing.assert_array_equal(ck.decrypt(sk.bitnot(ca)), 255 - A)


def test_comparisons(ikeys, cts):
    ck, sk = ikeys
    ca, cb = cts
    for fn, op in [(sk.eq, np.equal), (sk.ne, np.not_equal),
                   (sk.lt, np.less), (sk.le, np.less_equal),
                   (sk.gt, np.greater), (sk.ge, np.greater_equal)]:
        got = np.asarray(ck.key.decrypt(fn(ca, cb).block))
        np.testing.assert_array_equal(got, op(A, B).astype(np.uint64),
                                      err_msg=fn.__name__)


def test_scalar_comparisons(ikeys, cts):
    ck, sk = ikeys
    ca, _ = cts
    np.testing.assert_array_equal(np.asarray(ck.key.decrypt(sk.scalar_eq(ca, 200).block)),
                                  (A == 200).astype(np.uint64))
    np.testing.assert_array_equal(np.asarray(ck.key.decrypt(sk.scalar_lt(ca, 128).block)),
                                  (A < 128).astype(np.uint64))
    np.testing.assert_array_equal(np.asarray(ck.key.decrypt(sk.scalar_ge(ca, 123).block)),
                                  (A >= 123).astype(np.uint64))


def test_min_max_cmux(ikeys, cts):
    ck, sk = ikeys
    ca, cb = cts
    np.testing.assert_array_equal(ck.decrypt(sk.min(ca, cb)), np.minimum(A, B))
    np.testing.assert_array_equal(ck.decrypt(sk.max(ca, cb)), np.maximum(A, B))


def test_shifts(ikeys, cts):
    ck, sk = ikeys
    ca, _ = cts
    for s in [1, 3, 5]:
        np.testing.assert_array_equal(ck.decrypt(sk.scalar_left_shift(ca, s)),
                                      (A << s) % MOD, err_msg=f"lshift {s}")
        np.testing.assert_array_equal(ck.decrypt(sk.scalar_right_shift(ca, s)),
                                      A >> s, err_msg=f"rshift {s}")


def test_cast(ikeys, cts):
    ck, sk = ikeys
    ca, _ = cts
    import flax.struct  # noqa: F401
    wide = sk.cast_to_size(ca, 6)
    assert wide.num_blocks == 6
    ck6 = integer.RadixClientKey(key=ck.key, num_blocks=6)
    np.testing.assert_array_equal(ck6.decrypt(wide), A)
    narrow = sk.cast_to_size(ca, 2)
    ck2 = integer.RadixClientKey(key=ck.key, num_blocks=2)
    np.testing.assert_array_equal(ck2.decrypt(narrow), A % 16)


def test_signed(ikeys):
    ck, sk = ikeys
    vals = np.array([-128, -1, 0, 1, 127])
    ct = ck.encrypt_signed(jnp.asarray(vals), seed=4)
    np.testing.assert_array_equal(ck.decrypt_signed(ct), vals)
    s = sk.add(ct, ct)
    got = ck.decrypt_signed(integer.SignedRadixCiphertext(blocks=s.blocks))
    expect = ((vals + vals + 128) % 256) - 128
    np.testing.assert_array_equal(got, expect)


def test_crt(ikeys):
    ck, sk = ikeys
    # block moduli must fit the message space (residues < message_modulus = 4)
    cck = integer.CrtClientKey(key=ck.key, moduli=(3, 4))
    vals = np.array([0, 7, 11, 5])
    ca = cck.encrypt(jnp.asarray(vals), seed=5)
    cb = cck.encrypt(jnp.asarray(vals[::-1].copy()), seed=6)
    np.testing.assert_array_equal(cck.decrypt(sk.crt_add(ca, cb)),
                                  (vals + vals[::-1]) % 12)
    np.testing.assert_array_equal(cck.decrypt(sk.crt_mul(ca, cb)),
                                  (vals * vals[::-1]) % 12)
    np.testing.assert_array_equal(cck.decrypt(sk.crt_neg(ca)), (-vals) % 12)


def test_add_parallelized_log_depth(ikeys):
    """Hillis–Steele carry scan vs the sequential path, with carry chains."""
    ck, sk = ikeys
    a = np.array([255, 170, 85, 254])   # 0xFF forces a full carry chain
    b = np.array([1, 86, 171, 3])
    ca, cb = ck.encrypt(jnp.asarray(a), seed=40), ck.encrypt(jnp.asarray(b), seed=41)
    out = sk.add_parallelized(ca, cb)
    np.testing.assert_array_equal(ck.decrypt(out), (a + b) % MOD)


def test_rotations(ikeys, cts):
    """Bit rotations, scalar and encrypted amount (reference
    radix_parallel rotate_left/right + scalar_rotate variants)."""
    ck, sk = ikeys
    ca, _ = cts

    def rotl(x, r):
        r %= 8
        return ((x << r) | (x >> (8 - r))) % MOD

    for r in [0, 1, 3, 6, 8, 11]:
        np.testing.assert_array_equal(ck.decrypt(sk.scalar_rotate_left(ca, r)),
                                      rotl(A, r), err_msg=f"rotl {r}")
        np.testing.assert_array_equal(ck.decrypt(sk.scalar_rotate_right(ca, r)),
                                      rotl(A, (8 - r) % 8), err_msg=f"rotr {r}")

    amt = ck.encrypt(jnp.asarray([3] * len(A)), seed=11)
    np.testing.assert_array_equal(ck.decrypt(sk.rotate_left(ca, amt)),
                                  rotl(A, 3))
    np.testing.assert_array_equal(ck.decrypt(sk.rotate_right(ca, amt)),
                                  rotl(A, 5))


def test_scalar_bitwise_minmax_smallmul(ikeys, cts):
    ck, sk = ikeys
    ca, _ = cts
    np.testing.assert_array_equal(ck.decrypt(sk.scalar_bitand(ca, 0xA5)), A & 0xA5)
    np.testing.assert_array_equal(ck.decrypt(sk.scalar_bitor(ca, 0x5A)), A | 0x5A)
    np.testing.assert_array_equal(ck.decrypt(sk.scalar_bitxor(ca, 0xFF)), A ^ 0xFF)
    np.testing.assert_array_equal(ck.decrypt(sk.scalar_min(ca, 100)),
                                  np.minimum(A, 100))
    np.testing.assert_array_equal(ck.decrypt(sk.scalar_max(ca, 100)),
                                  np.maximum(A, 100))
    np.testing.assert_array_equal(ck.decrypt(sk.small_scalar_mul(ca, 3)),
                                  (A * 3) % MOD)


def test_block_mul(ikeys, cts):
    ck, sk = ikeys
    ca, _ = cts
    blk = ck.key.encrypt(jnp.asarray([3] * len(A)), seed=31)
    np.testing.assert_array_equal(ck.decrypt(sk.block_mul(ca, blk)),
                                  (A * 3) % MOD)
    np.testing.assert_array_equal(ck.decrypt(sk.block_mul(ca, blk, index=1)),
                                  (A * 3 * 4) % MOD)


def test_scalar_div_rem(ikeys, cts):
    ck, sk = ikeys
    ca, _ = cts
    for d in (1, 2, 3, 7, 10, 255):
        q, r = sk.scalar_div_rem(ca, d)
        np.testing.assert_array_equal(ck.decrypt(q), A // d, err_msg=f"d={d}")
        np.testing.assert_array_equal(ck.decrypt(r), A % d, err_msg=f"d={d}")


def test_overflowing_scalar(ikeys, cts):
    ck, sk = ikeys
    ca, _ = cts
    s, ov = sk.unsigned_overflowing_scalar_add(ca, 200)
    np.testing.assert_array_equal(ck.decrypt(s), (A + 200) % MOD)
    np.testing.assert_array_equal(ck.decrypt_bool(ov),
                                  (A + 200 >= MOD))
    d, borrow = sk.unsigned_overflowing_scalar_sub(ca, 100)
    np.testing.assert_array_equal(ck.decrypt(d), (A - 100) % MOD)
    np.testing.assert_array_equal(ck.decrypt_bool(borrow), (A < 100))


def test_crt_extended(ikeys):
    ck, sk = ikeys
    from tfhe_tpu.integer.client_key import CrtClientKey
    moduli = (2, 3, 5)
    crt_ck = CrtClientKey(key=ck.key, moduli=moduli)
    mod = 2 * 3 * 5
    a_vals, b_vals = np.array([7, 29, 0]), np.array([5, 11, 17])
    ca = crt_ck.encrypt(jnp.asarray(a_vals), seed=41)
    cb = crt_ck.encrypt(jnp.asarray(b_vals), seed=42)
    np.testing.assert_array_equal(crt_ck.decrypt(sk.crt_sub(ca, cb)),
                                  (a_vals - b_vals) % mod)
    np.testing.assert_array_equal(crt_ck.decrypt(sk.crt_scalar_mul(ca, 7)),
                                  (a_vals * 7) % mod)
    np.testing.assert_array_equal(crt_ck.decrypt(sk.crt_scalar_sub(ca, 4)),
                                  (a_vals - 4) % mod)
    np.testing.assert_array_equal(
        crt_ck.decrypt(sk.pbs_crt_compliant_function(ca, lambda x: x * x + 1)),
        (a_vals * a_vals + 1) % mod)


def test_encrypted_shift_rotate_full_range(ikeys):
    """Every amount 0..7 in one batch — exercises every selector group of
    the layered-selection shift/rotate (block-granular layers included),
    which small-amount tests miss."""
    ck, sk = ikeys
    amt = np.arange(8)
    a = np.array([0b10110101] * 8)
    ca = ck.encrypt(jnp.asarray(a), seed=21)
    cs = ck.encrypt(jnp.asarray(amt), seed=22)
    np.testing.assert_array_equal(ck.decrypt(sk.left_shift(ca, cs)),
                                  (a << amt) % MOD)
    np.testing.assert_array_equal(ck.decrypt(sk.right_shift(ca, cs)),
                                  a >> amt)
    np.testing.assert_array_equal(ck.decrypt(sk.rotate_left(ca, cs)),
                                  ((a << amt) | (a >> (8 - amt))) % MOD)
    np.testing.assert_array_equal(ck.decrypt(sk.rotate_right(ca, cs)),
                                  ((a >> amt) | (a << (8 - amt))) % MOD)
