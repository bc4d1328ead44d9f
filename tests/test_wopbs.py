"""WoP-PBS tests: bit extraction, circuit bootstrap, vertical packing and
the shortint WopbsKey (the analogue of shortint/wopbs/test.rs)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu import shortint
from tfhe_tpu.core.algorithms import decrypt_lwe
from tfhe_tpu.core.entities import LweCiphertext
from tfhe_tpu.core.params import TEST_PARAMS_SHORTINT
from tfhe_tpu.shortint.client_key import delta_for
from tfhe_tpu.shortint.wopbs import new_wopbs_key_only_for_wopbs


@pytest.fixture(scope="module")
def wkeys():
    ck, sk = shortint.gen_keys(TEST_PARAMS_SHORTINT, seed=41)
    wk = new_wopbs_key_only_for_wopbs(ck, sk, seed=42)
    return ck, sk, wk


def test_extract_bits(wkeys):
    ck, _, wk = wkeys
    msgs = jnp.asarray([0, 5, 10, 15], dtype=jnp.uint64)
    ct = ck.unchecked_encrypt(msgs, seed=1)
    bits = wk.extract_bits(ct)
    assert bits.data.shape[-2] == 4
    for i in range(4):  # MSB first
        bit_lwe = LweCiphertext(data=bits.data[..., i, :])
        phase = np.asarray(decrypt_lwe(bit_lwe, ck.lwe_sk, 64))
        got = ((phase + (1 << 62)) >> 63) % 2
        expect = (np.asarray(msgs) >> (3 - i)) & 1
        np.testing.assert_array_equal(got, expect, err_msg=f"bit {i}")


def test_wopbs_identity(wkeys):
    ck, _, wk = wkeys
    msgs = jnp.asarray([0, 3, 7, 12, 15], dtype=jnp.uint64)
    ct = ck.unchecked_encrypt(msgs, seed=2)
    lut = wk.generate_lut(lambda x: x)
    out = wk.wopbs(ct, lut)
    np.testing.assert_array_equal(
        np.asarray(ck.decrypt_message_and_carry(out)), np.asarray(msgs))


def test_wopbs_arbitrary_function(wkeys):
    """The whole point of WoP-PBS: a non-negacyclic LUT over all 16 values."""
    ck, _, wk = wkeys
    f = lambda x: (x * x + 3) % 16
    msgs = jnp.arange(16, dtype=jnp.uint64)
    ct = ck.unchecked_encrypt(msgs, seed=3)
    out = wk.wopbs(ct, wk.generate_lut(f))
    np.testing.assert_array_equal(
        np.asarray(ck.decrypt_message_and_carry(out)),
        [f(i) for i in range(16)])


def test_integer_wopbs_multi_polynomial_lut(wkeys):
    """Vertical packing where the LUT spans MULTIPLE polynomials: 5 blocks
    x 2 bits = 10 extracted bits > log2(N=256), so the CMux tree consumes
    the 2 excess MSB GGSWs over 4 LUT polynomials before the GGSW-driven
    blind rotation (reference vertical_packing, wop_pbs/mod.rs:785)."""
    from tfhe_tpu import integer
    from tfhe_tpu.integer.wopbs import new_integer_wopbs_key
    ck, sk, wk = wkeys
    rck = integer.RadixClientKey(key=ck, num_blocks=5)
    iwk = new_integer_wopbs_key(wk)
    f = lambda x: (x * 7 + 13) % 1024
    vals = np.array([0, 1023, 600])
    ct = rck.encrypt(jnp.asarray(vals), seed=8)
    out = iwk.wopbs(ct, f)
    np.testing.assert_array_equal(np.asarray(rck.decrypt(out)),
                                  [f(int(v)) for v in vals])


def test_crt_wopbs(wkeys):
    """CRT-wide LUT eval (reference integer/wopbs/mod.rs:716-780): each
    residue block gets f(x_j) mod m_j through ONE shared extracted-GGSW
    list; decryption reconstructs f applied componentwise."""
    from tfhe_tpu import integer
    from tfhe_tpu.integer.wopbs import new_integer_wopbs_key
    ck, sk, wk = wkeys
    moduli = (2, 3, 5)
    cck = integer.CrtClientKey(key=ck, moduli=moduli)
    iwk = new_integer_wopbs_key(wk)
    f = lambda x: x * x + 1
    msg_space = 30
    vals = np.array([0, 7, 19, 29])
    ct = cck.encrypt(jnp.asarray(vals), seed=6)
    out = iwk.wopbs_crt(ct, f)
    assert out.moduli == moduli
    # componentwise f is the CRT evaluation of f for ring functions
    expect = [f(int(v)) % msg_space for v in vals]
    np.testing.assert_array_equal(np.asarray(cck.decrypt(out)), expect)


def test_crt_wopbs_non_ring_function(wkeys):
    """Residues see only their own value: out_j = f(x_j) mod m_j exactly
    (the reference semantic — NOT f of the reconstructed integer)."""
    from tfhe_tpu import integer
    from tfhe_tpu.integer.wopbs import new_integer_wopbs_key
    ck, sk, wk = wkeys
    moduli = (3, 4)
    cck = integer.CrtClientKey(key=ck, moduli=moduli)
    iwk = new_integer_wopbs_key(wk)
    f = lambda x: 2 * x + 3
    vals = np.array([5, 11])
    ct = cck.encrypt(jnp.asarray(vals), seed=7)
    out = iwk.wopbs_crt(ct, f)
    for j, mj in enumerate(moduli):
        got = np.asarray(ck.decrypt_message_and_carry(out.blocks[j])) % mj
        expect = [(f(int(v) % mj)) % mj for v in vals]
        np.testing.assert_array_equal(got, expect, err_msg=f"residue {mj}")


def test_integer_wopbs(wkeys):
    """Radix-wide arbitrary LUT: f over the full 4-bit value (2 blocks)."""
    from tfhe_tpu import integer
    from tfhe_tpu.integer.wopbs import new_integer_wopbs_key
    ck, sk, wk = wkeys
    rck = integer.RadixClientKey(key=ck, num_blocks=2)
    isk = integer.ServerKey(key=sk)
    iwk = new_integer_wopbs_key(wk)
    f = lambda x: (x * 3 + 5) % 16
    vals = np.array([0, 7, 11, 15])
    ct = rck.encrypt(jnp.asarray(vals), seed=4)
    out = iwk.wopbs(ct, f)
    np.testing.assert_array_equal(rck.decrypt(out), [f(int(v)) for v in vals])
