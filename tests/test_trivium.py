"""Trivium/Kreyvium app tests: homomorphic keystream == clear model, and
transciphering round trip (analogue of apps/trivium/src tests, reduced
warm-up for CPU test speed)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu import boolean as B
from tfhe_tpu.apps import (KreyviumStream, TriviumStream,
                           clear_kreyvium_keystream, clear_trivium_keystream,
                           trans_decrypt_u64, trans_encrypt_u64)
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
