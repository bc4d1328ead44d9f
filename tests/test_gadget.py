"""Gadget (p-encodings) tests: encodings, gadget gates, LUTs, encoding
switching, MVB, tree bootstrap, GLWE mult and WoP-PBS — mirroring the fork's
gate tests (gadget/server_key/tests.rs)."""
import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu import gadget
from tfhe_tpu.gadget import Encoding, Gadget
from tfhe_tpu.gadget import engine as ge
from tfhe_tpu.core.params import TEST_PARAMS_GADGET


@pytest.fixture(scope="module")
def gkeys():
    return gadget.gen_keys(TEST_PARAMS_GADGET, seed=23)


def test_encoding_validation():
    e = Encoding.new_canonical_binary(1, 5)
    assert e.is_valid() and e.is_canonical()
    assert e.inverse_encoding(1) == 1 and e.inverse_encoding(0) == 0
    assert e.apply_lut_to_encoding(lambda x: 1 - x).parts[0] == frozenset([1])
    with pytest.raises(ValueError):
        # even p, non-negacyclic: x and its opposite in non-mirror parts
        Encoding(2, [[0], [2]], 4)


def test_encrypt_decrypt(gkeys):
    ck, _ = gkeys
    enc = Encoding.new_canonical(5, [0, 1, 2, 3, 4], 11)
    msgs = jnp.asarray([0, 1, 2, 3, 4])
    ct = gadget.encrypt_arithmetic(ck, msgs, enc, seed=3)
    np.testing.assert_array_equal(gadget.decrypt(ck, ct), np.arange(5))


@pytest.mark.parametrize("name,fn,vals,p", [
    ("and", lambda a, b: a & b, [1, 2], 5),
    ("or", lambda a, b: a | b, [1, 2], 5),
    ("xor", lambda a, b: a ^ b, [1, 2], 5),
    ("nand", lambda a, b: 1 - (a & b), [1, 2], 5),
])
def test_gadget_gates(gkeys, name, fn, vals, p):
    ck, sk = gkeys
    g = Gadget.new_canonical(fn, 2, vals, 1, p, p)
    a_bits = jnp.asarray([0, 0, 1, 1])
    b_bits = jnp.asarray([0, 1, 0, 1])
    ca = gadget.encrypt_arithmetic(ck, a_bits, g.enc_in[0], seed=4)
    cb = gadget.encrypt_arithmetic(ck, b_bits, g.enc_in[1], seed=5)
    out = g.exec(sk, [ca, cb])
    expect = [fn(a, b) for a, b in zip([0, 0, 1, 1], [0, 1, 0, 1])]
    np.testing.assert_array_equal(gadget.decrypt(ck, out), expect, err_msg=name)


def test_three_input_majority(gkeys):
    ck, sk = gkeys
    maj = lambda a, b, c: int(a + b + c >= 2)
    g = Gadget.new_canonical(maj, 3, [1, 1, 1], 1, 7, 7)
    combos = list(itertools.product([0, 1], repeat=3))
    cols = list(zip(*combos))
    cts = [gadget.encrypt_arithmetic(ck, jnp.asarray(col), g.enc_in[i], seed=6 + i)
           for i, col in enumerate(cols)]
    out = g.exec(sk, cts)
    np.testing.assert_array_equal(gadget.decrypt(ck, out),
                                  [maj(*c) for c in combos])


def test_apply_lut(gkeys):
    ck, sk = gkeys
    enc = Encoding.new_canonical(5, [0, 1, 2, 3, 4], 11)
    enc_out = Encoding.new_canonical(5, [0, 1, 2, 3, 4], 11)
    ct = gadget.encrypt_arithmetic(ck, jnp.asarray([0, 1, 2, 3, 4]), enc, seed=8)
    out = ge.apply_lut(sk, ct, enc_out, lambda x: (x * 2) % 5)
    np.testing.assert_array_equal(gadget.decrypt(ck, out),
                                  [(x * 2) % 5 for x in range(5)])


def test_encoding_switching(gkeys):
    ck, _ = gkeys
    enc = Encoding.new_canonical_binary(1, 7)
    ct = gadget.encrypt_arithmetic(ck, jnp.asarray([0, 1]), enc, seed=9)
    mul = ge.encoding_switching_mul_constant(ct, 3)
    assert mul.encoding.parts[1] == frozenset([3])
    np.testing.assert_array_equal(gadget.decrypt(ck, mul), [0, 1])
    add = ge.encoding_switching_sum_constant(ct, 2)
    assert add.encoding.parts[0] == frozenset([2])
    np.testing.assert_array_equal(gadget.decrypt(ck, add), [0, 1])


def test_mvb(gkeys):
    """Multi-value bootstrap: several LUT outputs from one blind rotation."""
    ck, sk = gkeys
    o = 5
    enc_in = Encoding.new_canonical(o, [0, 1, 2, 3, 4], 11)
    enc_out = Encoding.new_canonical(o, [0, 1, 2, 3, 4], 11)
    luts = [[(2 * x) % o for x in range(o)], [(x + 1) % o for x in range(o)]]
    msgs = jnp.asarray([0, 1, 2, 3, 4])
    ct = gadget.encrypt_arithmetic(ck, msgs, enc_in, seed=10)
    outs = ge.mvb(sk, ct, [enc_out, enc_out], luts)
    for lut, out in zip(luts, outs):
        np.testing.assert_array_equal(gadget.decrypt(ck, out),
                                      [lut[x] for x in range(o)])


def test_tree_bootstrap(gkeys):
    """Depth-2 tree: f(x1, x0) = lut[x0 + o0*x1] over Z_3 inputs."""
    ck, sk = gkeys
    o = 3
    enc = Encoding.new_canonical(o, [0, 1, 2], 7)
    t = o * o
    lut = [(2 * i + 1) % o for i in range(t)]
    x0 = jnp.asarray([0, 1, 2, 2])
    x1 = jnp.asarray([0, 2, 1, 2])
    c0 = gadget.encrypt_arithmetic(ck, x0, enc, seed=11)
    c1 = gadget.encrypt_arithmetic(ck, x1, enc, seed=12)
    out = ge.simple_tree_bootstrapping(sk, [c1, c0], enc, t, lut)
    expect = [lut[int(a) + o * int(b)] for a, b in zip(np.asarray(x0), np.asarray(x1))]
    np.testing.assert_array_equal(gadget.decrypt(ck, out), expect)


def test_lwe_mult(gkeys):
    """GLWE-tensor-product multiplication of power-of-two encodings."""
    ck, sk = gkeys
    p = 16
    enc = Encoding.new_trivial_wopbs(p)
    a = jnp.asarray([0, 1, 2, 3])
    b = jnp.asarray([0, 3, 5, 5])
    ca = gadget.encrypt_arithmetic(ck, a, enc, seed=13)
    cb = gadget.encrypt_arithmetic(ck, b, enc, seed=14)
    out = ge.lwe_mult(sk, ca, cb, enc)
    np.testing.assert_array_equal(gadget.decrypt(ck, out),
                                  (np.asarray(a) * np.asarray(b)) % p)


def test_woppbs_lut(gkeys):
    """WoP-PBS via multiplication: arbitrary (non-negacyclic) LUT.

    Input rides an odd-p encoding (o=16 in Z_17); the first PBS emits ±f at
    the even output modulus, the all-ones PBS emits ±1 with matching signs,
    and the GLWE multiplication cancels the sign."""
    ck, sk = gkeys
    o = 16
    enc_in = Encoding.new_canonical(o, list(range(o)), 17)
    enc_out = Encoding.new_trivial_wopbs(o)
    f = lambda x: (3 * x + 1) % o
    msgs = jnp.asarray([0, 1, 7, 12, 15])
    ct = gadget.encrypt_arithmetic(ck, msgs, enc_in, seed=15)
    out = ge.woppbs_lut(sk, ct, enc_out, f)
    np.testing.assert_array_equal(gadget.decrypt(ck, out),
                                  [f(int(x)) for x in np.asarray(msgs)])


def test_gadget_deep_circuit(gkeys, rs):
    """Long random gadget-gate chain vs the clear model (analogue of
    test_deep_circuit, gadget/server_key/tests.rs:763)."""
    ck, sk = gkeys
    gates = [
        (Gadget.new_canonical(lambda a, b: a & b, 2, [1, 2], 1, 5, 5),
         lambda a, b: a & b),
        (Gadget.new_canonical(lambda a, b: a | b, 2, [1, 2], 1, 5, 5),
         lambda a, b: a | b),
        (Gadget.new_canonical(lambda a, b: a ^ b, 2, [1, 2], 1, 5, 5),
         lambda a, b: a ^ b),
    ]
    a = np.array([0, 1, 1, 0])
    b = np.array([1, 1, 0, 0])
    enc = Encoding.new_canonical_binary(1, 5)
    ca = gadget.encrypt_arithmetic(ck, jnp.asarray(a), gates[0][0].enc_in[0], seed=50)
    cb = gadget.encrypt_arithmetic(ck, jnp.asarray(b), gates[0][0].enc_in[1], seed=51)
    cur_enc, cur_clear = ca, a.copy()
    for step in range(5):
        g, clear_fn = gates[rs.randint(len(gates))]
        # output encoding of a gadget is canonical binary value 1 — matches
        # the gate inputs' encoding, so chaining is closed
        cur_enc = g.exec(sk, [cur_enc, cb])
        cur_clear = clear_fn(cur_clear, b)
        np.testing.assert_array_equal(gadget.decrypt(ck, cur_enc), cur_clear,
                                      err_msg=f"step {step}")


def test_measure_noise(gkeys):
    """Fresh encryptions measure small noise; a trivial-style zero-noise
    phase measures exactly 0 (reference measure_noise semantics,
    gadget/engine/mod.rs:194-232)."""
    ck, _ = gkeys
    enc = Encoding.new_canonical(5, [0, 1, 2, 3, 4], 11)
    ct = gadget.encrypt_arithmetic(ck, jnp.arange(5), enc, seed=7)
    noise = gadget.measure_noise(ck, ct)
    assert noise.shape == (5,)
    # noise unit is torus-units x p; fresh std sigma*q*p must bound it
    std = max(ck.params.glwe_noise_std, ck.params.lwe_noise_std)
    bound = 8 * std * (1 << 64) * enc.modulus_p
    assert (np.abs(noise.astype(np.float64)) < bound).all()
    assert (noise != 0).any()  # real encryption has noise
    # trivial ct: only the delta = floor(2^64/p) truncation error remains
    triv = gadget.engine.trivial_encrypt(ck.params, jnp.arange(5), enc)
    tn = gadget.measure_noise(ck, triv)
    assert (np.abs(tn) <= enc.modulus_p ** 2).all()


def test_pattern_dump_roundtrip(gkeys, tmp_path, monkeypatch):
    """PATTERN-gated dump hook (reference gadget/ciphertext/mod.rs:283-301):
    writes only when PATTERN matches, records round-trip."""
    ck, _ = gkeys
    enc = Encoding.new_canonical_binary(1, 5)
    ct = gadget.encrypt_arithmetic(ck, jnp.asarray([1]), enc, seed=8)
    rec = gadget.SerializableCiphertext.from_ciphertext(ct, expected_msg=1)

    monkeypatch.delenv("PATTERN", raising=False)
    assert not rec.append_to_file("mypat", dump_dir=str(tmp_path))
    monkeypatch.setenv("PATTERN", "otherpat")
    assert not rec.append_to_file("mypat", dump_dir=str(tmp_path))
    monkeypatch.setenv("PATTERN", "mypat")
    assert rec.append_to_file("mypat", dump_dir=str(tmp_path))
    assert rec.append_to_file("mypat", dump_dir=str(tmp_path))

    recs = gadget.load_dumps(str(tmp_path / "mypat.pkl"))
    assert len(recs) == 2
    np.testing.assert_array_equal(recs[0]["values"],
                                  np.asarray(ct.lwe.data, dtype=np.uint64))
    assert recs[0]["expected_msg"] == 1 and recs[0]["modulus"] == 5


def test_linear_combination_and_mul_constant(gkeys):
    ck, sk = gkeys
    p = 7
    enc = Encoding.new_canonical(p, list(range(p)), p)
    xs = jnp.asarray([1, 2, 3])
    ys = jnp.asarray([2, 0, 1])
    cx = gadget.encrypt_arithmetic(ck, xs, enc, seed=71)
    cy = gadget.encrypt_arithmetic(ck, ys, enc, seed=72)
    out = ge.linear_combination([cx, cy], [2, 3], p)
    np.testing.assert_array_equal(
        gadget.decrypt(ck, out),
        (2 * np.asarray(xs) + 3 * np.asarray(ys)) % p)
    out2 = ge.simple_mul_constant(cx, 3, p)
    np.testing.assert_array_equal(gadget.decrypt(ck, out2),
                                  (3 * np.asarray(xs)) % p)


def test_full_tree_bootstrapping(gkeys):
    """f over Z_9 returned as two base-3 digits (reference
    full_tree_bootstrapping)."""
    ck, sk = gkeys
    o = 3
    enc = Encoding.new_canonical(o, [0, 1, 2], 7)
    t = o * o
    f = lambda x: (x * 2 + 1) % t
    x0, x1 = jnp.asarray([0, 2, 1]), jnp.asarray([1, 2, 0])
    c0 = gadget.encrypt_arithmetic(ck, x0, enc, seed=73)
    c1 = gadget.encrypt_arithmetic(ck, x1, enc, seed=74)
    hi, lo = ge.full_tree_bootstrapping(sk, [c1, c0], [enc, enc], t, f)
    vals = [f(int(a) + o * int(b)) for a, b in zip(np.asarray(x0), np.asarray(x1))]
    np.testing.assert_array_equal(gadget.decrypt(ck, lo), [v % o for v in vals])
    np.testing.assert_array_equal(gadget.decrypt(ck, hi), [v // o for v in vals])


def test_gadget_utilities(gkeys):
    ck, sk = gkeys
    assert Gadget.split_int_in_booleans(5, 4) == [1, 0, 1, 0]
    assert Gadget.split_int_in_booleans(5, 4, big_endian=True) == [0, 1, 0, 1]
    assert Gadget.vec_bool_to_int([1, 0, 1, 0]) == 5
    assert Gadget.vec_bool_to_int([0, 1, 0, 1], big_endian=True) == 5
    g = Gadget.new_canonical(lambda a, b: a & b, 2, [1, 2], 1, 5, 5)
    assert g.exec_clear([1, 1]) == 1 and g.exec_clear([1, 0]) == 0
    # cast_before_gadget_from_1 lifts {0,1}-encodings onto the gate inputs
    enc1 = Encoding.new_canonical_binary(1, 5)
    xs = jnp.asarray([1, 0])
    cts = [gadget.encrypt_arithmetic(ck, xs, enc1, seed=75 + i)
           for i in range(2)]
    lifted = g.cast_before_gadget_from_1(cts)
    assert lifted[0].encoding == g.enc_in[0]
    assert lifted[1].encoding == g.enc_in[1]
    out = g.exec(sk, lifted)
    np.testing.assert_array_equal(gadget.decrypt(ck, out),
                                  np.asarray(xs) & np.asarray(xs))


def test_encoding_switching_lut_and_modulus_switching(gkeys):
    ck, sk = gkeys
    enc5 = Encoding.new_canonical_binary(1, 5)
    enc7 = Encoding.new_canonical_binary(1, 7)
    xs = jnp.asarray([0, 1, 1])
    ct = gadget.encrypt_arithmetic(ck, xs, enc5, seed=77)
    out = ge.encoding_switching_lut(sk, ct, enc7)
    assert out.encoding.modulus_p == 7
    np.testing.assert_array_equal(gadget.decrypt(ck, out), np.asarray(xs))
    sw = Gadget.modulus_switching(sk, [ct], [5], 7)
    np.testing.assert_array_equal(gadget.decrypt(ck, sw[0]), np.asarray(xs))
