"""HLAPI tests: operator-overloaded FheUint types against the clear model
(the analogue of the reference's high_level_api tests)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu import hlapi
from tfhe_tpu.core.params import TEST_PARAMS_SHORTINT
from tfhe_tpu import shortint, integer


@pytest.fixture(scope="module")
def hkeys():
    ck_s, sk_s = shortint.gen_keys(TEST_PARAMS_SHORTINT, seed=33)
    ck = hlapi.ClientKey(ck_s)
    sk = hlapi.ServerKey(integer.ServerKey(key=sk_s))
    hlapi.set_server_key(sk)
    yield ck, sk
    hlapi.unset_server_key()


A = np.array([5, 200, 0, 255])
B = np.array([3, 100, 1, 2])


def test_fheuint8_roundtrip(hkeys):
    ck, _ = hkeys
    x = hlapi.FheUint8.encrypt(jnp.asarray(A), ck, seed=1)
    np.testing.assert_array_equal(x.decrypt(ck), A)


def test_fheuint8_arith(hkeys):
    ck, _ = hkeys
    x = hlapi.FheUint8.encrypt(jnp.asarray(A), ck, seed=2)
    y = hlapi.FheUint8.encrypt(jnp.asarray(B), ck, seed=3)
    np.testing.assert_array_equal((x + y).decrypt(ck), (A + B) % 256)
    np.testing.assert_array_equal((x - y).decrypt(ck), (A - B) % 256)
    np.testing.assert_array_equal((x * y).decrypt(ck), (A * B) % 256)
    np.testing.assert_array_equal((x + 7).decrypt(ck), (A + 7) % 256)
    np.testing.assert_array_equal((-x).decrypt(ck), (-A) % 256)


def test_fheuint8_bitwise_shift(hkeys):
    ck, _ = hkeys
    x = hlapi.FheUint8.encrypt(jnp.asarray(A), ck, seed=4)
    y = hlapi.FheUint8.encrypt(jnp.asarray(B), ck, seed=5)
    np.testing.assert_array_equal((x & y).decrypt(ck), A & B)
    np.testing.assert_array_equal((x | y).decrypt(ck), A | B)
    np.testing.assert_array_equal((x ^ y).decrypt(ck), A ^ B)
    np.testing.assert_array_equal((~x).decrypt(ck), 255 - A)
    np.testing.assert_array_equal((x << 2).decrypt(ck), (A << 2) % 256)
    np.testing.assert_array_equal((x >> 1).decrypt(ck), A >> 1)
    np.testing.assert_array_equal(x.rotate_left(3).decrypt(ck),
                                  ((A << 3) | (A >> 5)) % 256)
    np.testing.assert_array_equal(x.rotate_right(3).decrypt(ck),
                                  ((A >> 3) | (A << 5)) % 256)


def test_fheuint8_cmp_select(hkeys):
    ck, _ = hkeys
    x = hlapi.FheUint8.encrypt(jnp.asarray(A), ck, seed=6)
    y = hlapi.FheUint8.encrypt(jnp.asarray(B), ck, seed=7)
    np.testing.assert_array_equal((x.lt(y)).decrypt(ck), A < B)
    np.testing.assert_array_equal((x.ge(y)).decrypt(ck), A >= B)
    np.testing.assert_array_equal((x.eq(y)).decrypt(ck), A == B)
    cond = x.lt(y)
    np.testing.assert_array_equal(cond.select(x, y).decrypt(ck),
                                  np.where(A < B, A, B))
    np.testing.assert_array_equal(x.min(y).decrypt(ck), np.minimum(A, B))


def test_cast(hkeys):
    ck, _ = hkeys
    x = hlapi.FheUint8.encrypt(jnp.asarray(A), ck, seed=8)
    wide = x.cast_into(hlapi.FheUint16)
    np.testing.assert_array_equal(wide.decrypt(ck), A)
    narrow = x.cast_into(hlapi.FheUint4)
    np.testing.assert_array_equal(narrow.decrypt(ck), A % 16)


def test_fhebool(hkeys):
    ck, _ = hkeys
    a = np.array([True, False, True])
    b = np.array([True, True, False])
    x = hlapi.FheBool.encrypt(jnp.asarray(a), ck, seed=9)
    y = hlapi.FheBool.encrypt(jnp.asarray(b), ck, seed=10)
    np.testing.assert_array_equal((x & y).decrypt(ck), a & b)
    np.testing.assert_array_equal((x | y).decrypt(ck), a | b)
    np.testing.assert_array_equal((~x).decrypt(ck), ~a)


def test_trivial_encrypt(hkeys):
    ck, _ = hkeys
    x = hlapi.FheUint8.encrypt_trivial(jnp.asarray(A), ck)
    np.testing.assert_array_equal(x.decrypt(ck), A)


def test_div_mod_and_shift(hkeys):
    ck, _ = hkeys
    a = np.array([12, 9])
    b = np.array([5, 2])
    x = hlapi.FheUint4.encrypt(jnp.asarray(a), ck, seed=20)
    y = hlapi.FheUint4.encrypt(jnp.asarray(b), ck, seed=21)
    np.testing.assert_array_equal((x // y).decrypt(ck), a // b)
    np.testing.assert_array_equal((x % y).decrypt(ck), a % b)
    s = hlapi.FheUint4.encrypt(jnp.asarray([1, 2]), ck, seed=22)
    np.testing.assert_array_equal((x << s).decrypt(ck), (a << np.array([1, 2])) % 16)


def test_fheint_signed(hkeys):
    ck, _ = hkeys
    a = np.array([-100, 5, -1])
    b = np.array([3, -7, -1])
    x = hlapi.FheInt8.encrypt(jnp.asarray(a), ck, seed=23)
    y = hlapi.FheInt8.encrypt(jnp.asarray(b), ck, seed=24)
    np.testing.assert_array_equal((x + y).decrypt(ck), a + b)
    np.testing.assert_array_equal(x.lt(y).decrypt(ck), a < b)
    np.testing.assert_array_equal(x.ge(y).decrypt(ck), a >= b)
    np.testing.assert_array_equal(y.abs().decrypt(ck), np.abs(b))


def test_wide_unsigned_roundtrip(hkeys):
    """FheUint128/256 encrypt values beyond 2^64 exactly (Python-int block
    decomposition — reference U256 bigint path)."""
    ck, _ = hkeys
    vals = [2 ** 100 + 12345, (1 << 256) - 1, 7]
    x = hlapi.FheUint256.encrypt(vals, ck, seed=9)
    got = x.decrypt(ck)
    assert [int(v) for v in got] == [v % (1 << 256) for v in vals]
    y = hlapi.FheUint128.encrypt([2 ** 127 + 99], ck, seed=10)
    assert int(y.decrypt(ck)[0]) == 2 ** 127 + 99


def test_wide_signed_roundtrip(hkeys):
    """FheInt128/256 (reference HLAPI FheInt128/FheInt256)."""
    ck, _ = hkeys
    vals = [-(2 ** 100), 2 ** 90 + 1, -1]
    x = hlapi.FheInt128.encrypt(vals, ck, seed=11)
    assert [int(v) for v in x.decrypt(ck)] == vals
    z = hlapi.FheInt256.encrypt([-(2 ** 200) - 5], ck, seed=12)
    assert int(z.decrypt(ck)[0]) == -(2 ** 200) - 5


def test_scalar_operator_completion(hkeys):
    ck, _ = hkeys
    x = hlapi.FheUint8.encrypt(jnp.asarray(A), ck, seed=51)
    np.testing.assert_array_equal((10 - x).decrypt(ck), (10 - A) % 256)
    np.testing.assert_array_equal((x & 0xA5).decrypt(ck), A & 0xA5)
    np.testing.assert_array_equal((0x5A | x).decrypt(ck), A | 0x5A)
    np.testing.assert_array_equal((x ^ 0xFF).decrypt(ck), A ^ 0xFF)
    np.testing.assert_array_equal((x // 7).decrypt(ck), A // 7)
    np.testing.assert_array_equal((x % 7).decrypt(ck), A % 7)
    np.testing.assert_array_equal(x.ne(3).decrypt(ck), A != 3)
    np.testing.assert_array_equal(x.min(100).decrypt(ck), np.minimum(A, 100))
    np.testing.assert_array_equal(x.max(100).decrypt(ck), np.maximum(A, 100))


def test_overflowing_methods(hkeys):
    ck, _ = hkeys
    x = hlapi.FheUint8.encrypt(jnp.asarray(A), ck, seed=52)
    y = hlapi.FheUint8.encrypt(jnp.asarray(B), ck, seed=53)
    s, ov = x.overflowing_add(y)
    np.testing.assert_array_equal(s.decrypt(ck), (A + B) % 256)
    np.testing.assert_array_equal(ov.decrypt(ck), A + B >= 256)
    d, bw = x.overflowing_sub(y)
    np.testing.assert_array_equal(d.decrypt(ck), (A - B) % 256)
    np.testing.assert_array_equal(bw.decrypt(ck), A < B)


def test_signed_scalar_ops(hkeys):
    ck, _ = hkeys
    sa = np.array([-8, -1, 0, 7])
    x = hlapi.FheInt8.encrypt(jnp.asarray(sa), ck, seed=54)
    np.testing.assert_array_equal((x >> 1).decrypt(ck), sa >> 1)
    np.testing.assert_array_equal((x // 3).decrypt(ck),
                                  np.trunc(sa / 3).astype(np.int64))
    np.testing.assert_array_equal(x.lt(-2).decrypt(ck), sa < -2)
    np.testing.assert_array_equal(x.ge(0).decrypt(ck), sa >= 0)
    np.testing.assert_array_equal(x.min(0).decrypt(ck), np.minimum(sa, 0))


def test_public_key_encryption(hkeys):
    ck, _ = hkeys
    pk = hlapi.PublicKey(ck, seed=61)
    x = hlapi.FheUint8.encrypt_with_public_key(jnp.asarray(A), pk, seed=62)
    np.testing.assert_array_equal(x.decrypt(ck), A)
    y = x + 1
    np.testing.assert_array_equal(y.decrypt(ck), (A + 1) % 256)


def test_compressed_fheuint(hkeys):
    ck, _ = hkeys
    comp = hlapi.FheUint8.encrypt_compressed(jnp.asarray(A), ck, seed=63)
    x = comp.decompress()
    np.testing.assert_array_equal(x.decrypt(ck), A)
    np.testing.assert_array_equal((x * 2).decrypt(ck), (A * 2) % 256)


def test_compressed_server_key_hlapi(hkeys):
    ck, sk = hkeys
    csk = hlapi.CompressedServerKey(ck, seed=64)
    sk2 = csk.decompress()
    hlapi.set_server_key(sk2)
    try:
        x = hlapi.FheUint8.encrypt(jnp.asarray(B), ck, seed=65)
        np.testing.assert_array_equal((x + x).decrypt(ck), (2 * B) % 256)
    finally:
        hlapi.set_server_key(sk)


def test_hlapi_ggsw_shift_key(hkeys):
    """generate_keys(shift_key=...) routes encrypted-amount << through the
    GGSW-selector fast path at the operator surface."""
    ck_old, sk_old = hkeys
    from tfhe_tpu.core.params import TEST_PARAMS_WOPBS
    config = hlapi.ConfigBuilder().use_custom_parameters(
        "TEST_PARAMS_SHORTINT").build()
    ck, sk = hlapi.generate_keys(config, seed=77,
                                 shift_key=TEST_PARAMS_WOPBS)
    assert sk.radix.shift_key is not None
    hlapi.set_server_key(sk)
    try:
        x = hlapi.FheUint8.encrypt(jnp.asarray([0x5A, 0x81]), ck, seed=78)
        s = hlapi.FheUint8.encrypt(jnp.asarray([3, 1]), ck, seed=79)
        np.testing.assert_array_equal((x << s).decrypt(ck), [0xD0, 0x02])
    finally:
        hlapi.set_server_key(sk_old)
