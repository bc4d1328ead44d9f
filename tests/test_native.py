"""Native AES-CTR CSPRNG tests (the analogue of concrete-csprng's
generator tests + the dieharder-style determinism checks)."""
import collections

import numpy as np
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


def test_nist_style_randomness_battery():
    """Small NIST SP 800-22-style battery on the AES-CTR stream (the
    reference runs dieharder in CI, scripts/dieharder_test.sh): monobit,
    block frequency, runs, and longest-run-of-ones — all on 1 Mbit.
    Thresholds are ~5-sigma so the test is deterministic-stable for a
    correct generator and fails loudly for a broken one."""
    import math

    gen = native.AesCtrGenerator(seed=b"\x07" * 16)
    data = gen.generate(1 << 17)                       # 1 Mbit
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    n = bits.size

    # monobit: S/sqrt(n) ~ N(0,1)
    s = abs(int(bits.sum()) * 2 - n) / math.sqrt(n)
    assert s < 5.0, f"monobit z={s}"

    # block frequency (m=128): chi2 with n/m dof, mean dof, std sqrt(2 dof)
    m = 128
    blocks = bits[: n // m * m].reshape(-1, m).sum(axis=1) / m
    chi2 = 4 * m * float(((blocks - 0.5) ** 2).sum())
    dof = n // m
    assert abs(chi2 - dof) < 5 * math.sqrt(2 * dof), f"blockfreq chi2={chi2}"

    # runs: count of bit flips ~ N(2n pi (1-pi), ...) with pi ~ 0.5
    pi = bits.mean()
    v = int((bits[1:] != bits[:-1]).sum()) + 1
    z = abs(v - 2 * n * pi * (1 - pi)) / (2 * math.sqrt(2 * n) * pi * (1 - pi))
    assert z < 5.0, f"runs z={z}"

    # longest run of ones in the whole stream: for n=2^20 expect ~log2(n)=20
    # +/- a few; > 45 is astronomically unlikely, < 12 likewise
    changes = np.flatnonzero(np.diff(bits))
    lengths = np.diff(np.concatenate([[-1], changes, [n - 1]]))
    ones_runs = lengths[(0 if bits[0] else 1)::2]
    longest = int(ones_runs.max())
    assert 12 <= longest <= 45, f"longest ones-run {longest}"
