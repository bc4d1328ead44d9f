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


def test_op_family_variants(skeys):
    """unchecked/checked/smart twins agree with the clear model
    (reference per-op files add.rs, mul.rs, bitwise_op.rs, comp_op.rs)."""
    ck, sk = skeys
    a, b, ca, cb = enc_pairs(ck)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.checked_mul_lsb(ca, cb))),
                                  (a * b) % M)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.mul_msb(ca, cb))),
                                  (a * b) // M)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.unchecked_bitand(ca, cb))),
                                  a & b)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.checked_bitor(ca, cb))),
                                  a | b)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.smart_bitxor(ca, cb))),
                                  a ^ b)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.unchecked_greater(ca, cb))),
                                  (a > b).astype(np.uint64))
    np.testing.assert_array_equal(
        np.asarray(ck.decrypt(sk.checked_less_or_equal(ca, cb))),
        (a <= b).astype(np.uint64))
    # checked ops raise on carry overflow
    big = sk.unchecked_add(sk.unchecked_add(ca, ca), sk.unchecked_add(ca, ca))
    with pytest.raises(ValueError):
        sk.checked_add(big, big)
    with pytest.raises(ValueError):
        sk.checked_mul_lsb(big, cb)


def test_mul_small_carry(skeys):
    ck, sk = skeys
    a, b, ca, cb = enc_pairs(ck)
    out = sk.unchecked_mul_lsb_small_carry(ca, cb)
    np.testing.assert_array_equal(
        np.asarray(ck.decrypt(sk.message_extract(out))), (a * b) % M)


def test_correcting_term_sub(skeys):
    ck, sk = skeys
    a, b, ca, cb = enc_pairs(ck)
    out, z = sk.unchecked_sub_with_correcting_term(ca, cb)
    assert z % M == 0
    np.testing.assert_array_equal(
        np.asarray(ck.decrypt_message_and_carry(out)), (a - b + z))


def test_scalar_bitwise_and_cmp(skeys):
    ck, sk = skeys
    a = np.arange(M)
    ca = ck.encrypt(jnp.asarray(a), seed=21)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.scalar_bitand(ca, 2))),
                                  a & 2)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.scalar_bitor(ca, 1))),
                                  a | 1)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.scalar_bitxor(ca, 3))),
                                  a ^ 3)
    np.testing.assert_array_equal(
        np.asarray(ck.decrypt(sk.scalar_greater_or_equal(ca, 2))),
        (a >= 2).astype(np.uint64))
    np.testing.assert_array_equal(
        np.asarray(ck.decrypt(sk.scalar_not_equal(ca, 1))),
        (a != 1).astype(np.uint64))
    np.testing.assert_array_equal(
        np.asarray(ck.decrypt(sk.scalar_mod(ca, 3))), a % 3)
    np.testing.assert_array_equal(
        np.asarray(ck.decrypt(sk.unchecked_scalar_div(ca, 2))), a // 2)


def test_left_shift_linear_and_trivials(skeys):
    """unchecked_scalar_left_shift is a linear multiply into the carry
    (reference shift.rs) — no PBS, exact over message+carry."""
    ck, sk = skeys
    a = np.arange(M)
    ca = ck.encrypt(jnp.asarray(a), seed=22)
    out = sk.unchecked_scalar_left_shift(ca, 1)
    np.testing.assert_array_equal(np.asarray(ck.decrypt_message_and_carry(out)),
                                  a << 1)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(sk.smart_scalar_left_shift(ca, 1))) % M,
                                  (a << 1) % M)
    triv = sk.create_trivial(np.array([0, 1, 2, 3]))
    np.testing.assert_array_equal(np.asarray(ck.decrypt(triv)),
                                  np.array([0, 1, 2, 3]) % M)
    full = sk.unchecked_create_trivial(np.array([5]))
    np.testing.assert_array_equal(
        np.asarray(ck.decrypt_message_and_carry(full)), [5])
    assert sk.is_add_possible(ca, ca)
    assert sk.bootstrapping_key_size_bytes() > 0
    assert sk.key_switching_key_size_elements() > 0
    assert sk.deterministic_pbs_execution()


def test_max_noise_level_enforced(skeys):
    """MaxNoiseLevel enforcement (reference shortint/ciphertext/mod.rs:28-60):
    checked ops raise once accumulated linear noise exceeds the parameter
    set's bound; smart ops refresh instead; a PBS resets to NOMINAL."""
    ck, sk = skeys
    assert sk.max_noise_level.value == (M * TEST_PARAMS_SHORTINT.carry_modulus
                                        - 1) // (M - 1)  # == 5 for 2_2
    x = ck.encrypt(jnp.asarray([1]), seed=41)
    assert x.noise_level == shortint.NoiseLevel.NOMINAL

    # degree stays tiny (adding encryptions of 0/1) but noise accumulates
    zero = ck.encrypt(jnp.asarray([0]), seed=42)
    acc = x
    for _ in range(sk.max_noise_level.value - 1):
        acc = sk.unchecked_add(acc, zero)
    assert acc.noise_level == sk.max_noise_level.value
    # one more addition would exceed the bound -> checked op raises
    with pytest.raises(shortint.CheckError):
        sk.checked_add(acc, zero)
    assert not sk.is_add_possible(acc, zero)

    # smart op refreshes (noise back to NOMINAL via PBS) and still computes
    out = sk.smart_add(acc, zero)
    assert out.noise_level <= 2 * shortint.NoiseLevel.NOMINAL
    assert int(np.asarray(ck.decrypt(sk.message_extract(out)))[0]) == 1

    # scalar mul multiplies noise: 3x NOMINAL passes, 3x near-max fails
    assert sk.is_scalar_mul_possible(x, 3)
    assert not sk.is_scalar_mul_possible(acc, 3)

    # a PBS always resets the noise level
    lut = sk.generate_lookup_table(lambda v: v)
    assert sk.apply_lookup_table(acc, lut).noise_level == shortint.NoiseLevel.NOMINAL


def test_compressed_ciphertext_roundtrip(skeys):
    """shortint CompressedCiphertext (ciphertext/mod.rs:471-494): seeded
    encrypt -> decompress -> decrypt, wire size (n+1)x smaller, and the
    decompressed ciphertext works through a server op."""
    ck, sk = skeys
    msgs = jnp.asarray([0, 1, 2, 3], dtype=jnp.uint64)
    cct = ck.encrypt_compressed(msgs, seed=9)
    assert cct.ct.body.shape == (4,)          # bodies only on the wire
    np.testing.assert_array_equal(np.asarray(ck.decrypt_compressed(cct)),
                                  np.asarray(msgs))
    ct = cct.decompress()
    assert ct.degree == ck.params.message_modulus - 1
    lut = sk.generate_lookup_table(lambda x: (x + 1) % 4)
    out = sk.apply_lookup_table(ct, lut)
    np.testing.assert_array_equal(np.asarray(ck.decrypt(out)),
                                  (np.asarray(msgs) + 1) % 4)


def test_compressed_ciphertext_serialization(skeys, tmp_path):
    from tfhe_tpu.utils import serialization
    ck, _ = skeys
    cct = ck.encrypt_compressed(jnp.asarray([2, 1]), seed=10)
    path = tmp_path / "cct.npz"
    serialization.save(cct, path, compress=False)
    loaded = serialization.load(path)
    np.testing.assert_array_equal(np.asarray(ck.decrypt_compressed(loaded)),
                                  [2, 1])
