"""Combined-regime WoP-PBS key (reference WopbsKey::new_wopbs_key) and the
GGSW-selector encrypted-amount shifts built on it (integer/shift_key.py)."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu import integer, shortint
from tfhe_tpu.core.params import TEST_PARAMS_SHORTINT, TEST_PARAMS_WOPBS
from tfhe_tpu.shortint.wopbs import new_wopbs_key


@pytest.fixture(scope="module")
def combined():
    ck, sk = shortint.gen_keys(TEST_PARAMS_SHORTINT, seed=31)
    wk = new_wopbs_key(ck, sk, TEST_PARAMS_WOPBS, seed=32)
    return ck, sk, wk


def test_combined_wopbs_roundtrip(combined):
    """keyswitch_to_wopbs_params -> wopbs -> keyswitch_to_pbs_params
    evaluates an arbitrary (non-negacyclic) LUT end to end."""
    ck, sk, wk = combined
    f = lambda x: (x * 7 + 3) % 16
    msgs = jnp.asarray([0, 1, 5, 9, 15], dtype=jnp.uint64)
    ct = ck.unchecked_encrypt(msgs, seed=1)
    out = wk.wopbs(sk, ct, wk.generate_lut(f))
    np.testing.assert_array_equal(
        np.asarray(ck.decrypt_message_and_carry(out)),
        [f(int(v)) for v in np.asarray(msgs)])


def test_combined_regime_casts(combined):
    """The casts alone preserve the message (wopbs regime is decryptable
    under the re-derived wopbs client key)."""
    from tfhe_tpu.shortint.wopbs import _wopbs_client_key
    ck, sk, wk = combined
    wck = _wopbs_client_key(ck, TEST_PARAMS_WOPBS, 32)
    msgs = jnp.asarray([0, 3, 7, 14], dtype=jnp.uint64)
    ct = ck.unchecked_encrypt(msgs, seed=2)
    ct_w = wk.keyswitch_to_wopbs_params(sk, ct)
    np.testing.assert_array_equal(
        np.asarray(wck.decrypt_message_and_carry(ct_w)), np.asarray(msgs))
    back = wk.keyswitch_to_pbs_params(ct_w)
    np.testing.assert_array_equal(
        np.asarray(ck.decrypt_message_and_carry(back)), np.asarray(msgs))


# ---------------------------------------------------------------------------
# GGSW-selector shifts
# ---------------------------------------------------------------------------

NB = 4      # 8-bit values at 2_2


@pytest.fixture(scope="module")
def shift_keys():
    rck, isk = integer.gen_keys(TEST_PARAMS_SHORTINT, num_blocks=NB, seed=33,
                                shift_key=TEST_PARAMS_WOPBS)
    assert isk.shift_key is not None
    return rck, isk


def _clear(kind, v, s, bits):
    s %= 1 << max(1, math.ceil(math.log2(bits)))
    if kind == "shl":
        return (v << s) & ((1 << bits) - 1) if s < bits else 0
    if kind == "shr":
        return v >> s if s < bits else 0
    s %= bits
    if kind == "rotl":
        return ((v << s) | (v >> (bits - s))) & ((1 << bits) - 1) if s else v
    return ((v >> s) | (v << (bits - s))) & ((1 << bits) - 1) if s else v


@pytest.mark.parametrize("kind", ["shl", "shr", "rotl", "rotr"])
def test_ggsw_shift(shift_keys, kind):
    rck, isk = shift_keys
    bits = NB * 2
    vals = np.array([0x5A, 0x01, 0xFF, 0x80, 0x33], dtype=np.uint64)
    amts = np.array([0, 1, 3, 7, 6], dtype=np.uint64)
    a = rck.encrypt(jnp.asarray(vals), seed=3)
    s = rck.encrypt(jnp.asarray(amts), seed=4)
    op = {"shl": isk.left_shift, "shr": isk.right_shift,
          "rotl": isk.rotate_left, "rotr": isk.rotate_right}[kind]
    out = op(a, s)
    got = np.asarray(rck.decrypt(out))
    expect = [_clear(kind, int(v), int(x), bits) for v, x in zip(vals, amts)]
    np.testing.assert_array_equal(got, expect, err_msg=kind)


def test_ggsw_shift_wider_width(shift_keys):
    """16-bit operands (8 blocks, 4 selector bits -> 3 cmux levels + b0)
    through the same keys."""
    rck0, isk = shift_keys
    rck = integer.RadixClientKey(key=rck0.key, num_blocks=8)
    vals = np.array([0xBEEF, 0x8001], dtype=np.uint64)
    amts = np.array([9, 15], dtype=np.uint64)
    a = rck.encrypt(jnp.asarray(vals), seed=11)
    s = rck.encrypt(jnp.asarray(amts), seed=12)
    for kind, op in (("shl", isk.left_shift), ("rotr", isk.rotate_right)):
        got = np.asarray(rck.decrypt(op(a, s)))
        expect = [_clear(kind, int(v), int(x), 16)
                  for v, x in zip(vals, amts)]
        np.testing.assert_array_equal(got, expect, err_msg=kind)


def test_ggsw_arithmetic_right_shift(shift_keys):
    """Sign-extending >> by an encrypted amount: nb sign-fill blocks packed
    behind the data make the extension fall out of the same rotation."""
    rck, isk = shift_keys
    bits = NB * 2
    vals = np.array([-100, -1, 57, -128, 0], dtype=np.int64)
    amts = np.array([2, 7, 3, 1, 5], dtype=np.uint64)
    a = rck.encrypt_signed(jnp.asarray(vals), seed=13)
    s_u = rck.encrypt(jnp.asarray(amts), seed=14)
    out = isk.right_shift_arithmetic(a, s_u)
    got = np.asarray(rck.decrypt_signed(
        integer.SignedRadixCiphertext(blocks=out.blocks)))
    expect = [int(v) >> int(x) for v, x in zip(vals, amts)]
    np.testing.assert_array_equal(got, expect)
    # agree with the legacy ladder
    isk_l = integer.ServerKey(key=isk.key)
    slow = np.asarray(rck.decrypt_signed(integer.SignedRadixCiphertext(
        blocks=isk_l.right_shift_arithmetic(a, s_u).blocks)))
    np.testing.assert_array_equal(got, slow)


def test_ashr_non_pow2_width_gated(shift_keys):
    """Non-power-of-two total widths must NOT take the GGSW ashr fast path:
    the selector there can reach block shifts past the packed sign-fill
    blocks and read zero coefficients instead of sign material.  3 blocks =
    6 bits, shift amounts up to 7 >= width — must still be all-sign."""
    rck0, isk = shift_keys
    rck = integer.RadixClientKey(key=rck0.key, num_blocks=3)
    vals = np.array([-32, -1, 20, -9], dtype=np.int64)
    amts = np.array([7, 5, 6, 2], dtype=np.uint64)
    a = rck.encrypt_signed(jnp.asarray(vals), seed=21)
    s_u = rck.encrypt(jnp.asarray(amts), seed=22)
    out = isk.right_shift_arithmetic(a, s_u)
    got = np.asarray(rck.decrypt_signed(
        integer.SignedRadixCiphertext(blocks=out.blocks)))
    expect = [int(v) >> min(int(x), 5) for v, x in zip(vals, amts)]
    np.testing.assert_array_equal(got, expect)


def test_ggsw_shift_matches_layered(shift_keys):
    """The GGSW path and the layered fallback agree op-for-op."""
    rck, isk = shift_keys
    isk_layered = integer.ServerKey(key=isk.key)      # no shift key
    vals = np.array([0xA7, 0x12], dtype=np.uint64)
    amts = np.array([5, 2], dtype=np.uint64)
    a = rck.encrypt(jnp.asarray(vals), seed=5)
    s = rck.encrypt(jnp.asarray(amts), seed=6)
    fast = np.asarray(rck.decrypt(isk.left_shift(a, s)))
    slow = np.asarray(rck.decrypt(isk_layered.left_shift(a, s)))
    np.testing.assert_array_equal(fast, slow)


def test_shift_key_serialization_roundtrip(shift_keys, tmp_path):
    """ShiftKey survives the versioned npz round trip (the disk key cache
    the benches use)."""
    import jax
    from tfhe_tpu.utils import serialization
    rck, isk = shift_keys
    path = tmp_path / "shift_key.npz"
    serialization.save(isk.shift_key, path, compress=False)
    loaded = serialization.load(path)
    a = rck.encrypt(jnp.asarray([0x2D], dtype=jnp.uint64), seed=9)
    s = rck.encrypt(jnp.asarray([4], dtype=jnp.uint64), seed=10)
    isk2 = integer.ServerKey(key=isk.key, shift_key=loaded)
    got = np.asarray(rck.decrypt(isk2.rotate_left(a, s)))
    np.testing.assert_array_equal(got, [_clear("rotl", 0x2D, 4, NB * 2)])


def test_ggsw_shift_output_is_composable(shift_keys):
    """Shift outputs are fresh blocks: a follow-up op works on them."""
    rck, isk = shift_keys
    a = rck.encrypt(jnp.asarray([0x0F], dtype=jnp.uint64), seed=7)
    s = rck.encrypt(jnp.asarray([2], dtype=jnp.uint64), seed=8)
    out = isk.left_shift(a, s)                        # 0x3C
    out2 = isk.add_parallelized(out, out)             # 0x78
    np.testing.assert_array_equal(np.asarray(rck.decrypt(out2)), [0x78])
