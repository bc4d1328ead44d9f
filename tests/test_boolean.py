"""Boolean scheme tests: all gates over all operand combinations plus a
randomized deep circuit against a clear model (the analogue of
boolean gate tests and `test_deep_circuit`, gadget/server_key/tests.rs:763)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu import boolean as B
from tfhe_tpu.core.params import TEST_PARAMS_BOOLEAN


@pytest.fixture(scope="module")
def bkeys():
    return B.gen_keys(TEST_PARAMS_BOOLEAN, seed=17)


A = jnp.asarray([False, False, True, True])
Bv = jnp.asarray([False, True, False, True])


def test_encrypt_decrypt(bkeys):
    ck, _ = bkeys
    assert np.array_equal(np.asarray(B.decrypt(ck, B.encrypt(ck, A, seed=5))),
                          np.asarray(A))


def test_trivial(bkeys):
    ck, _ = bkeys
    ct = B.trivial_encrypt(ck.params, Bv)
    assert np.array_equal(np.asarray(B.decrypt(ck, ct)), np.asarray(Bv))


@pytest.mark.parametrize("name,fn,op", [
    ("and", B.and_, lambda a, b: a & b),
    ("or", B.or_, lambda a, b: a | b),
    ("xor", B.xor_, lambda a, b: a ^ b),
    ("nand", B.nand, lambda a, b: ~(a & b)),
    ("nor", B.nor, lambda a, b: ~(a | b)),
    ("xnor", B.xnor, lambda a, b: ~(a ^ b)),
])
def test_gates(bkeys, name, fn, op):
    ck, sk = bkeys
    ca, cb = B.encrypt(ck, A, seed=21), B.encrypt(ck, Bv, seed=22)
    out = np.asarray(B.decrypt(ck, fn(sk, ca, cb)))
    np.testing.assert_array_equal(out, np.asarray(op(A, Bv)))


def test_gate_with_trivial_operand(bkeys):
    ck, sk = bkeys
    ca = B.encrypt(ck, A, seed=23)
    cb = B.trivial_encrypt(ck.params, Bv)
    out = np.asarray(B.decrypt(ck, B.and_(sk, ca, cb)))
    np.testing.assert_array_equal(out, np.asarray(A & Bv))


def test_not_and_mux(bkeys):
    ck, sk = bkeys
    ca, cb = B.encrypt(ck, A, seed=24), B.encrypt(ck, Bv, seed=25)
    assert np.array_equal(np.asarray(B.decrypt(ck, B.not_(ca))), ~np.asarray(A))
    m = B.mux(sk, ca, cb, B.not_(cb))
    expect = np.where(np.asarray(A), np.asarray(Bv), ~np.asarray(Bv))
    np.testing.assert_array_equal(np.asarray(B.decrypt(ck, m)), expect)


def test_deep_circuit(bkeys, rs):
    """Chain of random gates, compared against the clear model."""
    ck, sk = bkeys
    gates = [(B.and_, np.logical_and), (B.or_, np.logical_or),
             (B.xor_, np.logical_xor), (B.nand, lambda a, b: ~(a & b))]
    clear = np.asarray(A)
    ct = B.encrypt(ck, A, seed=31)
    other_clear = np.asarray(Bv)
    other = B.encrypt(ck, Bv, seed=32)
    for i in range(6):
        g_enc, g_clear = gates[rs.randint(len(gates))]
        ct = g_enc(sk, ct, other)
        clear = np.asarray(g_clear(clear, other_clear)).astype(bool)
        np.testing.assert_array_equal(np.asarray(B.decrypt(ck, ct)), clear,
                                      err_msg=f"step {i}")


def test_boolean_key_switching(bkeys):
    """Cast a ciphertext from one boolean key set to another."""
    ck1, sk1 = bkeys
    ck2, sk2 = B.gen_keys(TEST_PARAMS_BOOLEAN, seed=171)
    bksk = B.gen_key_switching_key(ck1, ck2, seed=172)
    ct = B.encrypt(ck1, A, seed=173)
    cast = bksk.cast(ct)
    np.testing.assert_array_equal(np.asarray(B.decrypt(ck2, cast)), np.asarray(A))
    out = B.and_(sk2, cast, B.encrypt(ck2, Bv, seed=174))
    np.testing.assert_array_equal(np.asarray(B.decrypt(ck2, out)), np.asarray(A & Bv))


def test_u32_torus_gates():
    """The reference-width (u32) path: named boolean sets default to the
    64-bit torus for the fused kernel, but log_q=32 must keep working
    (reference boolean/mod.rs fixes u32)."""
    from tfhe_tpu.core.params import TEST_PARAMS_BOOLEAN_U32

    ck, sk = B.gen_keys(TEST_PARAMS_BOOLEAN_U32, seed=21)
    a = B.encrypt(ck, A, seed=5)
    b = B.encrypt(ck, Bv, seed=6)
    assert a.lwe.data.dtype == jnp.uint32
    got = np.asarray(B.decrypt(ck, B.xor_(sk, a, b)))
    assert np.array_equal(got, np.asarray(A) ^ np.asarray(Bv))
    got = np.asarray(B.decrypt(ck, B.nand(sk, a, b)))
    assert np.array_equal(got, ~(np.asarray(A) & np.asarray(Bv)))


def test_encrypt_compressed(bkeys):
    ck, sk = bkeys
    from tfhe_tpu import boolean
    msgs = jnp.asarray([True, False, True, True])
    comp = boolean.encrypt_compressed(ck, msgs, seed=91)
    ct = comp.decompress()
    np.testing.assert_array_equal(boolean.decrypt(ck, ct),
                                  np.asarray(msgs))
    out = boolean.and_(sk, ct, boolean.encrypt(ck, msgs, seed=92))
    np.testing.assert_array_equal(boolean.decrypt(ck, out), np.asarray(msgs))


def test_compressed_server_key(bkeys):
    """CompressedServerKey decompression produces a working server key
    (reference boolean/server_key/mod.rs CompressedServerKey)."""
    ck, _ = bkeys
    csk = B.gen_compressed_server_key(ck, seed=91)
    # wire size: bodies only ((k+1)x smaller BSK, (n+1)x smaller KSK)
    p = ck.params
    assert csk.seeded_bsk.bodies.ndim == 4          # [n, l, k+1, N], no mask
    assert csk.seeded_ksk.bodies.ndim == 2          # [big, l], no mask
    sk = csk.decompress()
    a = B.encrypt(ck, jnp.asarray([True, False, True, False]), seed=92)
    b = B.encrypt(ck, jnp.asarray([True, True, False, False]), seed=93)
    np.testing.assert_array_equal(
        np.asarray(B.decrypt(ck, B.and_(sk, a, b))),
        [True, False, False, False])
    np.testing.assert_array_equal(
        np.asarray(B.decrypt(ck, B.xor(sk, a, b))),
        [False, True, True, False])


def test_compressed_public_key(bkeys):
    """CompressedPublicKey (reference boolean/public_key/compressed.rs):
    decompressed key encrypts, private key decrypts."""
    ck, sk = bkeys
    cpk = B.gen_compressed_public_key(ck, seed=94)
    assert cpk.seeded.bodies.ndim == 1              # bodies only
    pk = cpk.decompress()
    msgs = jnp.asarray([True, False, False, True])
    ct = B.encrypt_with_public_key(pk, msgs, seed=95)
    np.testing.assert_array_equal(np.asarray(B.decrypt(ck, ct)),
                                  np.asarray(msgs))


def test_compressed_keys_serialization(bkeys, tmp_path):
    from tfhe_tpu.utils import serialization
    ck, _ = bkeys
    csk = B.gen_compressed_server_key(ck, seed=96)
    path = tmp_path / "bool_csk.npz"
    serialization.save(csk, path)
    csk2 = serialization.load(path)
    np.testing.assert_array_equal(np.asarray(csk.seeded_bsk.bodies),
                                  np.asarray(csk2.seeded_bsk.bodies))
    cpk = B.gen_compressed_public_key(ck, seed=97)
    path2 = tmp_path / "bool_cpk.npz"
    serialization.save(cpk, path2)
    cpk2 = serialization.load(path2)
    np.testing.assert_array_equal(np.asarray(cpk.seeded.bodies),
                                  np.asarray(cpk2.seeded.bodies))
