"""Native AES-CTR CSPRNG tests (the analogue of concrete-csprng's
generator tests + the dieharder-style determinism checks)."""
import collections

import pytest

native = pytest.importorskip("tfhe_tpu.native")


def test_aes_fips197_vector():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    assert native.aes128_encrypt_block(key, pt).hex() == \
        "3925841d02dc09fbdc118597196a0b32"


def test_backend_parity():
    """AES-NI (when present) and the portable software path are bit-identical
    (reference: aesni/soft generator implems, concrete-csprng §2.1)."""
    assert native.backend() in ("aesni", "soft")
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = native.aes128_encrypt_block(key, pt)
    assert ct == native.aes128_encrypt_block_soft(key, pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"  # FIPS-197 C.1


def test_stream_determinism_and_chunking():
    g1 = native.AesCtrGenerator(b"0123456789abcdef")
    g2 = native.AesCtrGenerator(b"0123456789abcdef")
    a = g1.generate(100)
    b = b"".join(g2.generate(n) for n in (1, 7, 16, 76))
    assert a == b


def test_fork_determinism_and_independence():
    def make():
        g = native.AesCtrGenerator(b"0123456789abcdef")
        g.generate(10)
        return g

    c1 = make().fork(3).generate(16)
    c2 = make().fork(3).generate(16)
    assert c1 == c2
    assert make().fork(4).generate(16) != c1
    assert native.AesCtrGenerator(b"another-seed-16b").fork(3).generate(16) != c1


def test_rough_uniformity():
    g = native.AesCtrGenerator(b"0123456789abcdef")
    data = g.generate(1 << 16)
    counts = collections.Counter(data)
    # every byte value appears, within loose bounds of the mean (256)
    assert len(counts) == 256
    assert all(120 < c < 420 for c in counts.values())
