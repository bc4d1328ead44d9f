"""FHE Trivium / Kreyvium stream ciphers + transciphering.

Reference: apps/trivium/src/ (trivium_bool.rs, kreyvium_bool.rs,
trans_ciphering/mod.rs).  The 288-bit Trivium state is evaluated over
encrypted booleans: per clock, 3 AND gates (PBS) + linear XORs; batching
rides the boolean scheme's batch axis, so one `TriviumStream` instance can
clock many independent streams at once.

Transciphering (`TransCiphering` trait, trans_ciphering/mod.rs:14): the
client sends data XOR-masked with a Trivium keystream; the server generates
the same keystream under FHE and XORs it in homomorphically, producing
FHE-encrypted data without the client ever running big FHE encryptions.
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from .. import boolean as B


def _xor3(sk, a, b, c):
    return B.xor_(sk, B.xor_(sk, a, b), c)


class TriviumStream:
    """Encrypted Trivium (reference TriviumStreamBool, trivium_bool.rs).

    key: 80 BoolCiphertexts (or clear bools → trivially encrypted);
    iv: 80 clear bools.  `warmup_rounds` defaults to the spec's 1152 but can
    be reduced for tests.
    """

    KEY_BITS = 80
    IV_BITS = 80

    def __init__(self, sk: B.ServerKey, key_bits: Sequence, iv_bits: Sequence[int],
                 params=None, warmup_rounds: int = 4 * 288):
        self.sk = sk
        params = params or sk.params
        trivial = lambda v: B.trivial_encrypt(params, jnp.asarray(v, dtype=bool))
        enc_key = [b if isinstance(b, B.BoolCiphertext) else trivial(b)
                   for b in key_bits]
        zeros = trivial(False)
        ones = trivial(True)
        # key[i]/iv[i] follow the reference convention (bit i of the eSTREAM
        # byte stream, LSB-first within bytes); the flat state here keeps the
        # NEWEST bit at s[0], so the loaded segments are reversed.  Pinned
        # against the official test vectors (tests/test_trivium.py).
        key_f = list(enc_key) + [zeros] * (self.KEY_BITS - len(enc_key))
        iv_f = ([trivial(bool(b)) for b in iv_bits]
                + [zeros] * (self.IV_BITS - len(iv_bits)))
        # registers: A = 93 (key, reversed), B = 84 (iv, reversed), C = 111
        self.state: List[B.BoolCiphertext] = (
            key_f[::-1] + [zeros] * 13
            + iv_f[::-1] + [zeros] * 4
            + [zeros] * 108 + [ones] * 3)
        for _ in range(warmup_rounds):
            self._clock()

    def _clock(self) -> B.BoolCiphertext:
        s = self.state
        sk = self.sk
        t1 = B.xor_(sk, s[65], s[92])
        t2 = B.xor_(sk, s[161], s[176])
        t3 = B.xor_(sk, s[242], s[287])
        z = _xor3(sk, t1, t2, t3)
        a1 = B.and_(sk, s[90], s[91])
        a2 = B.and_(sk, s[174], s[175])
        a3 = B.and_(sk, s[285], s[286])
        new_a = _xor3(sk, t3, a3, s[68])
        new_b = _xor3(sk, t1, a1, s[170])
        new_c = _xor3(sk, t2, a2, s[263])
        self.state = ([new_a] + s[:92] + [new_b] + s[93:176] + [new_c] + s[177:287])
        return z

    def next_bit(self) -> B.BoolCiphertext:
        return self._clock()

    def next_bits(self, n: int) -> List[B.BoolCiphertext]:
        return [self._clock() for _ in range(n)]


class KreyviumStream(TriviumStream):
    """Encrypted Kreyvium (reference kreyvium_bool.rs): Trivium with 128-bit
    key/IV and two extra shift registers feeding the feedback."""

    KEY_BITS = 128
    IV_BITS = 128

    def __init__(self, sk: B.ServerKey, key_bits, iv_bits, params=None,
                 warmup_rounds: int = 4 * 288):
        params = params or sk.params
        trivial = lambda v: B.trivial_encrypt(params, jnp.asarray(v, dtype=bool))
        enc_key = [b if isinstance(b, B.BoolCiphertext) else trivial(b)
                   for b in key_bits]
        assert len(enc_key) == 128 and len(iv_bits) == 128
        self.sk = sk
        zeros = trivial(False)
        ones = trivial(True)
        enc_iv = [trivial(bool(b)) for b in iv_bits]
        self.k_reg = list(enc_key[::-1])            # K* taps key[127], key[126], ...
        self.iv_reg = list(enc_iv[::-1])
        # A = key[35:128] reversed; B = iv[44:128] reversed;
        # C = iv[0:44] reversed + 66 ones + one zero (newest-at-s[0] layout;
        # pinned against the official Kreyvium vectors)
        self.state = (enc_key[35:][::-1]
                      + enc_iv[44:][::-1]
                      + enc_iv[:44][::-1]
                      + [ones] * 66 + [zeros])
        for _ in range(warmup_rounds):
            self._clock()

    def _clock(self) -> B.BoolCiphertext:
        s = self.state
        sk = self.sk
        k_out = self.k_reg[0]
        iv_out = self.iv_reg[0]
        self.k_reg = self.k_reg[1:] + [k_out]
        self.iv_reg = self.iv_reg[1:] + [iv_out]
        t1 = B.xor_(sk, s[65], s[92])
        t2 = B.xor_(sk, s[161], s[176])
        t3 = _xor3(sk, s[242], s[287], k_out)
        z = _xor3(sk, t1, t2, t3)
        a1 = B.and_(sk, s[90], s[91])
        a2 = B.and_(sk, s[174], s[175])
        a3 = B.and_(sk, s[285], s[286])
        new_a = _xor3(sk, t3, a3, s[68])
        new_b = _xor3(sk, B.xor_(sk, t1, a1), s[170], iv_out)
        new_c = _xor3(sk, t2, a2, s[263])
        self.state = ([new_a] + s[:92] + [new_b] + s[93:176] + [new_c] + s[177:287])
        return z


# ---------------------------------------------------------------------------
# clear models (for tests and for the client-side keystream)
# ---------------------------------------------------------------------------


def clear_trivium_keystream(key_bits, iv_bits, n: int,
                            warmup_rounds: int = 4 * 288) -> List[int]:
    key_f = list(key_bits) + [0] * (80 - len(key_bits))
    iv_f = list(iv_bits) + [0] * (80 - len(iv_bits))
    s = (key_f[::-1] + [0] * 13
         + iv_f[::-1] + [0] * 4
         + [0] * 108 + [1, 1, 1])
    out = []
    for r in range(warmup_rounds + n):
        t1 = s[65] ^ s[92]
        t2 = s[161] ^ s[176]
        t3 = s[242] ^ s[287]
        z = t1 ^ t2 ^ t3
        new_a = t3 ^ (s[285] & s[286]) ^ s[68]
        new_b = t1 ^ (s[90] & s[91]) ^ s[170]
        new_c = t2 ^ (s[174] & s[175]) ^ s[263]
        s = [new_a] + s[:92] + [new_b] + s[93:176] + [new_c] + s[177:287]
        if r >= warmup_rounds:
            out.append(z)
    return out


def clear_kreyvium_keystream(key_bits, iv_bits, n: int,
                             warmup_rounds: int = 4 * 288) -> List[int]:
    key_bits = list(key_bits)
    iv_bits = list(iv_bits)
    s = (key_bits[35:][::-1] + iv_bits[44:][::-1] + iv_bits[:44][::-1]
         + [1] * 66 + [0])
    k_reg = key_bits[::-1]
    iv_reg = iv_bits[::-1]
    out = []
    for r in range(warmup_rounds + n):
        k_out, k_reg = k_reg[0], k_reg[1:] + [k_reg[0]]
        iv_out, iv_reg = iv_reg[0], iv_reg[1:] + [iv_reg[0]]
        t1 = s[65] ^ s[92]
        t2 = s[161] ^ s[176]
        t3 = s[242] ^ s[287] ^ k_out
        z = t1 ^ t2 ^ t3
        new_a = t3 ^ (s[285] & s[286]) ^ s[68]
        new_b = t1 ^ (s[90] & s[91]) ^ s[170] ^ iv_out
        new_c = t2 ^ (s[174] & s[175]) ^ s[263]
        s = [new_a] + s[:92] + [new_b] + s[93:176] + [new_c] + s[177:287]
        if r >= warmup_rounds:
            out.append(z)
    return out


# ---------------------------------------------------------------------------
# transciphering (reference trans_ciphering/mod.rs)
# ---------------------------------------------------------------------------


def trans_encrypt_u64(value: int, keystream_bits: Sequence[int]) -> int:
    """Client side: XOR-mask a u64 with 64 clear keystream bits."""
    mask = 0
    for i, b in enumerate(keystream_bits[:64]):
        mask |= (int(b) & 1) << i
    return (int(value) ^ mask) & ((1 << 64) - 1)


def trans_decrypt_u64(masked: int, stream: TriviumStream, hl_client_key,
                      cast_ksk=None):
    """Server side: regenerate 64 encrypted keystream bits and XOR them into
    the masked clear value, yielding FHE-encrypted bits of the plaintext
    (reference TransCiphering::decrypt_64).

    Returns the 64 encrypted plaintext bits (LSB first); packing into an
    FheUint64 goes through the casting keyswitch when `cast_ksk` is given.
    """
    ks = stream.next_bits(64)
    out_bits = []
    for i in range(64):
        clear_bit = (masked >> i) & 1
        if clear_bit:
            out_bits.append(B.not_(ks[i]))
        else:
            out_bits.append(ks[i])
    return out_bits
