"""NTT kernel parity against an exact python-int schoolbook oracle
(the analogue of the reference's polynomial algorithm tests,
algorithms/polynomial_algorithms.rs doc tests)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu.core.poly import negacyclic_polymul, get_plan
from tfhe_tpu.core.poly.ntt import (PRIMES_31, garner_to_torus, ntt_forward,
                                    ntt_inverse, required_num_primes)


def oracle_negacyclic(a_signed, b_signed, log_q):
    n = len(a_signed)
    c = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            if k < n:
                c[k] += a_signed[i] * b_signed[j]
            else:
                c[k - n] -= a_signed[i] * b_signed[j]
    return np.array([x % (1 << log_q) for x in c],
                    dtype=np.uint64 if log_q == 64 else np.uint32)


def to_signed64(x):
    return [int(v) - (1 << 64) if int(v) >= 1 << 63 else int(v) for v in x]


@pytest.mark.parametrize("n", [64, 256])
def test_polymul_u64_exact(rs, n):
    a = rs.randint(0, 1 << 63, n).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    b = rs.randint(-(1 << 10), 1 << 10, n).astype(np.int64)
    ref = oracle_negacyclic(to_signed64(a), [int(x) for x in b], 64)
    out = np.asarray(negacyclic_polymul(jnp.asarray(a), jnp.asarray(b), 64))
    np.testing.assert_array_equal(out, ref)


def test_polymul_u32_exact(rs):
    n = 128
    a = rs.randint(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    b = rs.randint(-31, 32, n).astype(np.int64)
    ref = oracle_negacyclic([int(x) for x in a], [int(x) for x in b], 32)
    out = np.asarray(negacyclic_polymul(jnp.asarray(a), jnp.asarray(b), 32,
                                        log_bound=32 + 7 + 6))
    np.testing.assert_array_equal(out, ref)


def test_ntt_roundtrip(rs):
    n = 512
    plan = get_plan(n, 3)
    x = rs.randint(-(1 << 20), 1 << 20, (4, n)).astype(np.int64)
    hat = ntt_forward(plan, jnp.asarray(x))
    back = garner_to_torus(plan, ntt_inverse(plan, hat), 64)
    np.testing.assert_array_equal(np.asarray(back).astype(np.int64), x)


def test_required_num_primes():
    assert required_num_primes(28) == 1
    assert required_num_primes(58) == 2
    assert required_num_primes(97) == 4


def test_primes_are_ntt_friendly():
    for p in PRIMES_31:
        assert (p - 1) % (1 << 14) == 0 and p < (1 << 30)


def test_high_n_primes_are_ntt_friendly():
    """N > 8192 (e.g. PARAM_MESSAGE_4_CARRY_4's 32768) needs 2n | p - 1;
    the PRIMES_31 pool tops out at 2^14/2^15 and psi = g^((p-1)//(2n))
    silently truncates past that — the round-5 4_4 chip run decrypted
    wrong for exactly this reason (regression guard)."""
    from tfhe_tpu.core.poly.ntt import PRIMES_HIGH_N, primes_for
    for p in PRIMES_HIGH_N:
        assert (p - 1) % (1 << 17) == 0 and p < (1 << 30)
    assert primes_for(8192) is PRIMES_31
    for n in (16384, 32768):
        pool = primes_for(n)
        for p in pool:
            assert (p - 1) % (2 * n) == 0


@pytest.mark.parametrize("n", [16384, 32768])
def test_ntt_roundtrip_high_n(rs, n):
    """Round-trip + spot negacyclic product at the 4_4-regime sizes (the
    plan must pick the high-2-adicity pool or psi has the wrong order and
    everything decodes to garbage)."""
    plan = get_plan(n, 4)
    for p in plan.primes:
        assert (p - 1) % (2 * n) == 0
    x = rs.randint(-(1 << 20), 1 << 20, (2, n)).astype(np.int64)
    hat = ntt_forward(plan, jnp.asarray(x))
    back = garner_to_torus(plan, ntt_inverse(plan, hat), 64)
    np.testing.assert_array_equal(np.asarray(back).astype(np.int64), x)
    # monomial product: X^7 * a == negacyclic rotation (exercises psi)
    a = rs.randint(0, 1 << 63, n).astype(np.uint64)
    b = np.zeros(n, dtype=np.int64)
    b[7] = 1
    out = np.asarray(negacyclic_polymul(jnp.asarray(a), jnp.asarray(b), 64))
    exp = np.concatenate([(np.uint64(0) - a[n - 7:]), a[:n - 7]])
    np.testing.assert_array_equal(out, exp)
