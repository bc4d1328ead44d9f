"""Trivium/Kreyvium app tests: homomorphic keystream == clear model, and
transciphering round trip (analogue of apps/trivium/src tests, reduced
warm-up for CPU test speed)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    """This module accumulates enough distinct compiled programs that XLA's
    CPU backend_compile segfaults on the shortint fixture's keygen compile
    (deterministic at the 8th test in one process; the same compile in a
    fresh process is fine).  The module-scope clear in conftest.py is not
    enough WITHIN the module — drop the jit caches after every test here."""
    yield
    jax.clear_caches()

from tfhe_tpu import boolean as B
from tfhe_tpu.apps import (KreyviumStream, KreyviumStreamByte,
                           KreyviumStreamShortint, TriviumStream,
                           TriviumStreamByte, TriviumStreamShortint,
                           clear_kreyvium_keystream, clear_trivium_keystream,
                           trans_decrypt_u64_bits, trans_encrypt_u64)
from tfhe_tpu.core.params import TEST_PARAMS_BOOLEAN

WARMUP = 16   # reduced from the spec's 1152 to keep CPU tests fast
NBITS = 8


@pytest.fixture(scope="module")
def bkeys():
    return B.gen_keys(TEST_PARAMS_BOOLEAN, seed=61)


def _hex_stream(bits):
    """eSTREAM presentation: bytes assembled LSB-first, printed %02X
    (reference apps/trivium get_hexadecimal_string_from_lsb_first_stream)."""
    return "".join("%02X" % sum(bits[i + j] << j for j in range(8))
                   for i in range(0, len(bits), 8))


def _bits_from_hex(h, n):
    bits = []
    for i in range(0, len(h), 2):
        v = int(h[i:i + 2], 16)
        bits += [(v >> j) & 1 for j in range(8)]
    return bits[:n]


def test_trivium_official_vectors():
    """Official Trivium vectors (same ones asserted by the reference's
    apps/trivium/src/trivium/test.rs), full 1152-round warmup."""
    ks = clear_trivium_keystream([0] * 80, [0] * 80, 512)
    assert _hex_stream(ks).startswith(
        "FBE0BF265859051B517A2E4E239FC97F563203161907CF2DE7A8790FA1B2E9CD")
    key = [0] * 80
    key[7] = 1                      # key bytes 80 00 ... (LSB-first bits)
    ks = clear_trivium_keystream(key, [0] * 80, 512)
    assert _hex_stream(ks).startswith(
        "38EB86FF730D7A9CAF8DF13A4420540DBB7B651464C87501552041C249F29A64")
    key = _bits_from_hex("0053A6F94C9FF24598EB", 80)
    iv = _bits_from_hex("0D74DB42A91077DE45AC", 80)
    ks = clear_trivium_keystream(key, iv, 512)
    assert _hex_stream(ks).startswith(
        "F4CD954A717F26A7D6930830C4E7CF0819F80E03F25F342C64ADC66ABA7F8A8E")


def test_kreyvium_official_vectors():
    """Official Kreyvium vectors (reference apps/trivium/src/kreyvium/test.rs)."""
    assert _hex_stream(clear_kreyvium_keystream(
        [0] * 128, [0] * 128, 64)) == "26DCF1F4BC0F1922"
    key = [0] * 128
    key[0] = 1
    assert _hex_stream(clear_kreyvium_keystream(
        key, [0] * 128, 64)) == "4FD421D4DA3D2C8A"
    iv = [0] * 128
    iv[0] = 1
    assert _hex_stream(clear_kreyvium_keystream(
        [0] * 128, iv, 64)) == "C9217BA0D762ACA1"


def test_trivium_matches_clear(bkeys, rs):
    ck, sk = bkeys
    key_bits = [int(b) for b in rs.randint(0, 2, 80)]
    iv_bits = [int(b) for b in rs.randint(0, 2, 80)]
    enc_key = [B.encrypt(ck, jnp.asarray(bool(b)), seed=100 + i)
               for i, b in enumerate(key_bits)]
    stream = TriviumStream(sk, enc_key, iv_bits, warmup_rounds=WARMUP)
    clear = clear_trivium_keystream(key_bits, iv_bits, NBITS, warmup_rounds=WARMUP)
    got = [bool(np.asarray(B.decrypt(ck, z))) for z in stream.next_bits(NBITS)]
    assert got == [bool(b) for b in clear]


def test_kreyvium_matches_clear(bkeys, rs):
    ck, sk = bkeys
    key_bits = [int(b) for b in rs.randint(0, 2, 128)]
    iv_bits = [int(b) for b in rs.randint(0, 2, 128)]
    enc_key = [B.encrypt(ck, jnp.asarray(bool(b)), seed=300 + i)
               for i, b in enumerate(key_bits)]
    stream = KreyviumStream(sk, enc_key, iv_bits, warmup_rounds=WARMUP)
    clear = clear_kreyvium_keystream(key_bits, iv_bits, 4, warmup_rounds=WARMUP)
    got = [bool(np.asarray(B.decrypt(ck, z))) for z in stream.next_bits(4)]
    assert got == [bool(b) for b in clear]


def test_transciphering_roundtrip(bkeys, rs):
    """Client XOR-masks a value with the clear keystream; the server XORs the
    encrypted keystream back in; decrypting recovers the value's bits.

    Only the 16 low bits are checked on CPU — the full-64 path is the same
    loop, and its XLA-CPU compile churn has triggered an upstream LLVM-JIT
    segfault under memory pressure on this 2-vCPU host."""
    ck, sk = bkeys
    key_bits = [int(b) for b in rs.randint(0, 2, 80)]
    iv_bits = [int(b) for b in rs.randint(0, 2, 80)]
    value = 0xBEEF

    clear_ks = clear_trivium_keystream(key_bits, iv_bits, 64, warmup_rounds=WARMUP)
    masked = trans_encrypt_u64(value, clear_ks)

    enc_key = [B.trivial_encrypt(ck.params, jnp.asarray(bool(b)))
               for b in key_bits]
    stream = TriviumStream(sk, enc_key, iv_bits, warmup_rounds=WARMUP)
    ks16 = stream.next_bits(16)
    got = 0
    for i, eb in enumerate(ks16):
        clear_bit = (masked >> i) & 1
        out = B.not_(eb) if clear_bit else eb
        got |= int(bool(np.asarray(B.decrypt(ck, out)))) << i
    assert got == value & 0xFFFF


def test_trivium_byte_clear_official_vectors():
    """Clear byte-representation model against the official vectors, full
    1152-round warmup (reference trivium_byte.rs + its test.rs)."""
    st = TriviumStreamByte([0] * 10, [0] * 10)
    out = []
    for _ in range(8):
        out += st.next_64()
    assert "".join("%02X" % b for b in out).startswith(
        "FBE0BF265859051B517A2E4E239FC97F")
    key = list(bytes.fromhex("0053A6F94C9FF24598EB"))
    iv = list(bytes.fromhex("0D74DB42A91077DE45AC"))
    st = TriviumStreamByte(key, iv)
    out = st.next_64()
    assert "".join("%02X" % b for b in out) == "F4CD954A717F26A7"


def test_kreyvium_byte_clear_matches_bit_model():
    from tfhe_tpu.apps.trivium import _lsb_bits_of_bytes
    kb = list(bytes.fromhex("0053A6F94C9FF24598EB0D74DB42A910"))
    ib = list(bytes.fromhex("0D74DB42A91077DE45AC0053A6F94C9F"))
    st = KreyviumStreamByte(kb, ib)
    got = st.next_64() + st.next_64()
    ks = clear_kreyvium_keystream(
        _lsb_bits_of_bytes(kb), _lsb_bits_of_bytes(ib), 128)
    want = [sum(ks[8 * i + j] << j for j in range(8)) for i in range(16)]
    assert got == want


@pytest.fixture(scope="module")
def trivium_shortint_keys():
    """Internal (msg 2, carry 4) + HLAPI (2_2) key sets with a casting KSK
    (reference gen_keys(PARAM_MESSAGE_1_CARRY_1_KS_PBS) +
    PARAM_KEYSWITCH_1_1_KS_PBS_TO_2_2_KS_PBS)."""
    from tfhe_tpu import hlapi, shortint
    from tfhe_tpu.core.params import (ShortintKeySwitchingParameters,
                                      TEST_PARAMS_SHORTINT,
                                      TEST_PARAMS_TRIVIUM)
    ck1, sk1 = shortint.gen_keys(TEST_PARAMS_TRIVIUM, seed=71)
    hl_ck, hl_sk = hlapi.generate_keys(
        hlapi.ConfigBuilder().use_custom_parameters(
            "TEST_PARAMS_SHORTINT").build(), seed=72)
    ksk = shortint.generate_key_switching_key(
        ck1, hl_ck.shortint_ck,
        ShortintKeySwitchingParameters(ks_base_log=3, ks_level=5),
        seed=73, dest_server_key=hl_sk.radix.key)
    return ck1, sk1, hl_ck, hl_sk, ksk


def test_trivium_shortint_matches_clear(trivium_shortint_keys, rs):
    """Shortint-representation keystream equals the clear model (reference
    trivium_shortint.rs; the 64 parallel steps run as stacked PBS batches)."""
    ck1, sk1, _, _, _ = trivium_shortint_keys
    key_bits = [int(b) for b in rs.randint(0, 2, 80)]
    iv_bits = [int(b) for b in rs.randint(0, 2, 80)]
    enc_key = [ck1.encrypt(jnp.asarray(int(b), dtype=jnp.uint64),
                           seed=200 + i) for i, b in enumerate(key_bits)]
    stream = TriviumStreamShortint(enc_key, iv_bits, sk1, warmup_rounds=1)
    clear = clear_trivium_keystream(key_bits, iv_bits, 64, warmup_rounds=64)
    got = [int(np.asarray(ck1.decrypt(z))) for z in stream.next_64()]
    assert got == clear


def test_kreyvium_shortint_matches_clear(trivium_shortint_keys, rs):
    ck1, sk1, _, _, _ = trivium_shortint_keys
    key_bits = [int(b) for b in rs.randint(0, 2, 128)]
    iv_bits = [int(b) for b in rs.randint(0, 2, 128)]
    enc_key = [ck1.encrypt(jnp.asarray(int(b), dtype=jnp.uint64),
                           seed=300 + i) for i, b in enumerate(key_bits)]
    stream = KreyviumStreamShortint(enc_key, iv_bits, sk1, warmup_rounds=1)
    clear = clear_kreyvium_keystream(key_bits, iv_bits, 64, warmup_rounds=64)
    got = [int(np.asarray(ck1.decrypt(z))) for z in stream.next_64()]
    assert got == clear


def test_trivium_shortint_transciphering_fheuint64(trivium_shortint_keys, rs):
    """Full TransCiphering round trip (reference trans_ciphering/mod.rs):
    the client XOR-masks a u64 with the clear keystream and sends it
    trivially encrypted; the server XORs in the FHE keystream (pairs packed
    through the casting KSK) and the result decrypts to the value as a real
    FheUint64 — no dead parameters, actual 64-bit packing."""
    from tfhe_tpu import hlapi
    ck1, sk1, hl_ck, hl_sk, ksk = trivium_shortint_keys
    key_bits = [int(b) for b in rs.randint(0, 2, 80)]
    iv_bits = [int(b) for b in rs.randint(0, 2, 80)]
    value = 0xDEADBEEFCAFEF00D

    # client: clear keystream mask (warmup 1 round of 64)
    clear_ks = clear_trivium_keystream(key_bits, iv_bits, 64, warmup_rounds=64)
    masked = trans_encrypt_u64(value, clear_ks)

    # server: encrypted keystream, packed and cast into the HLAPI space
    enc_key = [ck1.encrypt(jnp.asarray(int(b), dtype=jnp.uint64),
                           seed=400 + i) for i, b in enumerate(key_bits)]
    stream = TriviumStreamShortint(enc_key, iv_bits, sk1, cast_ksk=ksk,
                                   hl_server_key=hl_sk, warmup_rounds=1)
    hlapi.set_server_key(hl_sk)
    cipher = hlapi.FheUint64.encrypt_trivial(masked, hl_ck)
    out = stream.trans_decrypt_64(cipher)
    assert int(out.decrypt(hl_ck)) == value


def test_trivium_byte_fhe_matches_clear(trivium_shortint_keys):
    """FheUint8 byte representation (reference TriviumStreamByte<FheUint8>):
    one batched radix pipeline for the 8 byte-steps; keystream equals the
    clear byte model."""
    from tfhe_tpu import hlapi
    _, _, hl_ck, hl_sk, _ = trivium_shortint_keys
    hlapi.set_server_key(hl_sk)
    key = list(bytes.fromhex("0053A6F94C9FF24598EB"))
    iv = list(bytes.fromhex("0D74DB42A91077DE45AC"))
    enc_key = [hlapi.FheUint8.encrypt(k, hl_ck, seed=500 + i)
               for i, k in enumerate(key)]
    st = TriviumStreamByte(enc_key, iv, server_key=hl_sk, warmup_rounds=0)
    st_clear = TriviumStreamByte(key, iv, warmup_rounds=0)
    got = [int(hlapi.FheUint8(v).decrypt(hl_ck)) for v in st.next_64()]
    assert got == st_clear.next_64()
