"""Exact negacyclic polynomial multiplication via CRT number-theoretic
transforms.

TPU-native replacement for the reference's f64 twisted FFT
(tfhe/src/core_crypto/fft_impl/fft64/math/fft/mod.rs): this TPU has no
float64 and no FFT lowering, but 64-bit integer multiply/add are fast
(XLA emulates them over 32-bit pairs).  Integer *division*, however, is
~200x slower than multiply — so the hot path never divides: every modular
multiplication uses Shoup's precomputed-quotient trick

    q = mulhi_32(a, w_shoup);  r = a*w - q*p  ∈ [0, 2p);  condsub p

with per-twiddle (and per-BSK-entry) precomputed w_shoup = floor(w*2^32/p),
and modular additions use compare-and-subtract.  Spectra are uint64
(values < 2^32): uint32 lowering is pathologically slow on this backend.

We compute negacyclic convolutions *exactly* over a residue number system of
31-bit primes and reconstruct mod 2^64 with Garner's algorithm, so unlike
the reference's f64 pipeline this backend adds **zero** rounding noise.

Structure per prime p (p ≡ 1 mod 2N):
  twist by psi^j → Gentleman-Sande (DIF) NTT, natural→scrambled
  → pointwise MAC → Cooley-Tukey (DIT) inverse, scrambled→natural
  → untwist by psi^{-j}/N → Garner CRT → signed lift mod 2^q.

No bit-reversal permutations are needed because products are taken between
identically-scrambled spectra.  All tables are precomputed in numpy (python
ints) once per (N, primes) plan and closed over by the jitted callers.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# NTT primes just below 2^30 with p ≡ 1 (mod 2^14): negacyclic NTT up to
# N = 2^13, and p < 2^30 leaves the headroom (2p, 4p < 2^32) that the Pallas
# kernel's approximate-mulhi Shoup multiplication and lazy reductions need.
PRIMES_31 = (   # name kept for source compatibility; values are 30-bit
    1073692673,  # 2^30 - 49151·... (k·2^14 + 1)
    1073643521,
    1073479681,
    1073430529,
    1073299457,
    1073233921,  # primes 6-7 give the ~210-bit CRT range that the
    1073184769,  # 128-bit-modulus external product needs (pbs128.py)
)

# High-N pool: p ≡ 1 (mod 2^17), so a primitive 2N-th root of unity exists
# up to N = 2^16 (PARAM_MESSAGE_4_CARRY_4's N = 32768 needs 2^16 | p - 1;
# the PRIMES_31 pool tops out at 2^14/2^15 and psi = g^((p-1)//(2n))
# silently truncates past that — the round-5 4_4 chip run decrypted wrong
# for exactly this reason).  Same < 2^30 headroom rule as PRIMES_31.
PRIMES_HIGH_N = (
    1073479681,  # 2-adicity 2^18 (shared with PRIMES_31)
    1071513601,
    1070727169,
    1068236801,
    1065484289,
    1064697857,
    1062862849,
)


def primes_for(n: int):
    """The CRT prime pool for polynomial size n (negacyclic NTT needs a
    2n-th root of unity, i.e. 2n | p - 1 for every pool prime)."""
    if n <= (1 << 13):
        return PRIMES_31
    assert n <= (1 << 16), f"N={n} exceeds the high-N prime pool's 2-adicity"
    return PRIMES_HIGH_N

_U32 = jnp.uint32
_U64 = jnp.uint64


def _pow_mod(b: int, e: int, p: int) -> int:
    return pow(b, e, p)


def _primitive_root(p: int) -> int:
    n = p - 1
    factors = set()
    m, d = n, 2
    while d * d <= m:
        while m % d == 0:
            factors.add(d)
            m //= d
        d += 1
    if m > 1:
        factors.add(m)
    g = 2
    while True:
        if all(_pow_mod(g, n // f, p) != 1 for f in factors):
            return g
        g += 1


def required_num_primes(log_bound: float) -> int:
    """Primes so the CRT modulus exceeds 2^(log_bound+1) (signed values)."""
    acc = 0.0
    for i, p in enumerate(PRIMES_31):
        acc += np.log2(p)
        if acc >= log_bound + 1.0:
            return i + 1
    raise ValueError(f"convolution bound 2^{log_bound} too large for prime pool")


def shoup(w: int, p: int) -> int:
    return (w << 32) // p


def _table(vals_per_prime):
    """[P, ...] uint64 array + its Shoup twin (u64 throughout: uint32 ops are
    ~200x slower than uint64 on this TPU backend)."""
    raw = np.array([[v for v, _ in row] for row in vals_per_prime], dtype=np.uint64)
    sh = np.array([[s for _, s in row] for row in vals_per_prime], dtype=np.uint64)
    return raw, sh


class NttPlan:
    """Precomputed tables for negacyclic NTT of size N over CRT primes."""

    def __init__(self, n: int, num_primes: int):
        assert n & (n - 1) == 0, "N must be a power of two"
        self.n = n
        self.log_n = n.bit_length() - 1
        self.primes = primes_for(n)[:num_primes]
        self.num_primes = num_primes

        twists, untwists = [], []
        fwd_stages = [[] for _ in range(self.log_n)]
        inv_stages = [[] for _ in range(self.log_n)]
        for p in self.primes:
            g = _primitive_root(p)
            psi = _pow_mod(g, (p - 1) // (2 * n), p)
            psi_inv = _pow_mod(psi, p - 2, p)
            w = (psi * psi) % p
            w_inv = _pow_mod(w, p - 2, p)
            n_inv = _pow_mod(n, p - 2, p)
            twists.append([(t := _pow_mod(psi, j, p), shoup(t, p)) for j in range(n)])
            untwists.append([
                (u := (_pow_mod(psi_inv, j, p) * n_inv) % p, shoup(u, p))
                for j in range(n)])
            m = n
            for s in range(self.log_n):
                wm = _pow_mod(w, n // m, p)
                fwd_stages[s].append([
                    (t := _pow_mod(wm, j, p), shoup(t, p)) for j in range(m // 2)])
                m //= 2
            m = 2
            for s in range(self.log_n):
                wm_inv = _pow_mod(w_inv, n // m, p)
                inv_stages[s].append([
                    (t := _pow_mod(wm_inv, j, p), shoup(t, p)) for j in range(m // 2)])
                m *= 2

        self.p64 = np.array(self.primes, dtype=np.uint64).reshape(num_primes, 1)
        self.twist = _table(twists)          # ([P,N], [P,N])
        self.untwist = _table(untwists)
        self.fwd_w = [_table(t) for t in fwd_stages]
        self.inv_w = [_table(t) for t in inv_stages]

        # Garner constants (python ints; consumed as scalars)
        P = list(self.primes)
        self.garner_inv = []
        self.garner_weights = []
        for i in range(num_primes):
            prod = 1
            for j in range(i):
                prod *= P[j]
            self.garner_inv.append(_pow_mod(prod % P[i], P[i] - 2, P[i]) if i else 1)
            self.garner_weights.append([
                int(np.prod([1] + P[:j], dtype=object)) % P[i] for j in range(i)])
        M = 1
        for p in P:
            M *= p
        half_digits = []
        h = M // 2
        for p in P:
            half_digits.append(h % p)
            h //= p
        self.half_digits = half_digits
        prefixes = [int(np.prod([1] + P[:j], dtype=object)) for j in range(num_primes)]
        self.prefix_mod = [x & ((1 << 64) - 1) for x in prefixes]
        self.M_mod = M & ((1 << 64) - 1)
        self.prefix_mod128 = [x & ((1 << 128) - 1) for x in prefixes]
        self.M_mod128 = M & ((1 << 128) - 1)


@functools.lru_cache(maxsize=None)
def get_plan(n: int, num_primes: int) -> NttPlan:
    return NttPlan(n, num_primes)


# ---------------------------------------------------------------------------
# division-free modular primitives (uint64 arrays holding values < 2^32)
# ---------------------------------------------------------------------------


def mulmod_shoup(a, w, w_shoup, p64):
    """a*w mod p with precomputed w_shoup = floor(w*2^32/p); w < p, a < 2^32.
    One u64 mulhi + one u64 mullo, a compare-subtract — no division.
    All operands uint64 (values < 2^32)."""
    q = (a * w_shoup) >> _U64(32)
    r = a * w - q * p64
    return jnp.where(r >= p64, r - p64, r)


def addmod(a, b, p64):
    s = a + b
    return jnp.where(s >= p64, s - p64, s)


def submod(a, b, p64):
    return jnp.where(a >= b, a - b, a + p64 - b)


def mulmod_shoup_scalar(a, w: int, p: int):
    """Scalar-constant modular multiply (for Garner constants); a is u64."""
    ws = _U64(shoup(w, p))
    q = (a * ws) >> _U64(32)
    r = a * _U64(w) - q * _U64(p)
    p64 = _U64(p)
    return jnp.where(r >= p64, r - p64, r)


# ---------------------------------------------------------------------------
# transforms — spectra are uint64 [..., P, N], values < p
# ---------------------------------------------------------------------------


def _reduce_small_signed(x, plan):
    """int digits with |x| < p → residues [..., P, N] u64 (no division)."""
    s = jnp.asarray(x).astype(jnp.int64)[..., None, :]          # [..., 1, N]
    p_i64 = plan.p64.astype(np.int64)                           # [P, 1]
    r = jnp.where(s < 0, s + p_i64, s)
    return r.astype(_U64)


def _reduce_torus(x, plan):
    """uint torus values → residues (uses %, cold paths only)."""
    s = jnp.asarray(x).astype(jnp.int64)[..., None, :]
    r = s % plan.p64.astype(np.int64)
    return r.astype(_U64)


def _dif_forward(plan, v):
    """u32 residues [..., P, N] (natural) → scrambled spectra, with twist."""
    n = plan.n
    p64 = jnp.asarray(plan.p64)
    tw, tw_s = plan.twist
    v = mulmod_shoup(v, jnp.asarray(tw), jnp.asarray(tw_s), p64)
    m = n
    for st in range(plan.log_n):
        half = m // 2
        shape = v.shape[:-1] + (n // m, m)
        v = v.reshape(shape)
        lo, hi = v[..., :half], v[..., half:]
        w, ws = plan.fwd_w[st]
        wj = jnp.asarray(w)[:, None, :]
        wjs = jnp.asarray(ws)[:, None, :]
        p_b = p64[:, None, :]
        new_lo = addmod(lo, hi, p_b)
        new_hi = mulmod_shoup(submod(lo, hi, p_b), wj, wjs, p_b)
        v = jnp.concatenate([new_lo, new_hi], axis=-1).reshape(v.shape[:-2] + (n,))
        m //= 2
    return v


def ntt_forward_digits(plan: NttPlan, digits) -> jnp.ndarray:
    """Signed small digits [..., N] → spectra [..., P, N] u64 < p.  Hot path."""
    return _dif_forward(plan, _reduce_small_signed(digits, plan))


def ntt_forward(plan: NttPlan, x) -> jnp.ndarray:
    """General integer input (torus values as signed reps) → spectra u64 < p."""
    return _dif_forward(plan, _reduce_torus(x, plan))


def ntt_inverse(plan: NttPlan, v) -> jnp.ndarray:
    """Scrambled spectra [..., P, N] u64 → coefficient residues u64 < p."""
    n = plan.n
    p64 = jnp.asarray(plan.p64)
    m = 2
    for st in range(plan.log_n):
        half = m // 2
        shape = v.shape[:-1] + (n // m, m)
        v = v.reshape(shape)
        lo, hi = v[..., :half], v[..., half:]
        w, ws = plan.inv_w[st]
        p_b = p64[:, None, :]
        hi = mulmod_shoup(hi, jnp.asarray(w)[:, None, :],
                          jnp.asarray(ws)[:, None, :], p_b)
        new_lo = addmod(lo, hi, p_b)
        new_hi = submod(lo, hi, p_b)
        v = jnp.concatenate([new_lo, new_hi], axis=-1).reshape(v.shape[:-2] + (n,))
        m *= 2
    ut, ut_s = plan.untwist
    return mulmod_shoup(v, jnp.asarray(ut), jnp.asarray(ut_s), p64)


def pointwise_mac(plan: NttPlan, a_hat, b_hat, b_shoup=None) -> jnp.ndarray:
    """Σ_J a_hat[..., P, J, N] * b_hat[..., P, J, R, N] mod p → [..., P, R, N].

    With b_shoup (precomputed for key material) the product is division-free;
    without, falls back to u64 mul + %."""
    if b_shoup is not None:
        p_b = jnp.asarray(plan.p64)[:, None, None, :]
        a = a_hat[..., :, :, None, :]
        prod = mulmod_shoup(a, b_hat, b_shoup, p_b)
        acc = prod[..., 0, :, :]
        for j in range(1, prod.shape[-3]):
            acc = addmod(acc, prod[..., j, :, :], jnp.asarray(plan.p64)[:, None, :])
        return acc
    p64 = jnp.asarray(plan.p64)[:, None, None, :]
    prod = (a_hat[..., :, :, None, :] * b_hat) % p64
    return prod.sum(axis=-3) % jnp.asarray(plan.p64)[:, None, :]


def pointwise_mul(plan: NttPlan, a_hat, b_hat) -> jnp.ndarray:
    """Elementwise spectra product mod p (cold paths)."""
    p64 = jnp.asarray(plan.p64)
    return (a_hat * b_hat) % p64


def _garner_digits(plan: NttPlan, res):
    """CRT residues [..., P, N] → mixed-radix digits t_i < p_i (list of P
    arrays) plus the (value >= M/2) signed-lift predicate."""
    P = plan.num_primes
    v = [res[..., i, :] for i in range(P)]
    t = [v[0]]
    for i in range(1, P):
        pi = plan.primes[i]
        p64 = _U64(pi)
        acc = jnp.zeros_like(v[i])
        for j in range(i):
            acc = addmod(acc, mulmod_shoup_scalar(t[j], plan.garner_weights[i][j], pi), p64)
        diff = submod(v[i], acc, p64)
        t.append(mulmod_shoup_scalar(diff, plan.garner_inv[i], pi))
    ge = jnp.zeros(t[0].shape, dtype=bool)
    eq = jnp.ones(t[0].shape, dtype=bool)
    for i in reversed(range(P)):
        h = _U64(plan.half_digits[i])
        ge = ge | (eq & (t[i] > h))
        eq = eq & (t[i] == h)
    return t, ge | eq


def garner_to_torus(plan: NttPlan, res, log_q: int) -> jnp.ndarray:
    """CRT residues [..., P, N] u32 → signed-lifted value mod 2^log_q [..., N].
    Division-free: all Garner constants use scalar Shoup multiplies."""
    P = plan.num_primes
    v = [res[..., i, :] for i in range(P)]
    t = [v[0]]
    for i in range(1, P):
        pi = plan.primes[i]
        p64 = _U64(pi)
        acc = jnp.zeros_like(v[i])
        for j in range(i):
            acc = addmod(acc, mulmod_shoup_scalar(t[j], plan.garner_weights[i][j], pi), p64)
        diff = submod(v[i], acc, p64)
        t.append(mulmod_shoup_scalar(diff, plan.garner_inv[i], pi))
    c = jnp.zeros(t[0].shape, dtype=_U64)
    for i in range(P):
        c = c + t[i] * _U64(plan.prefix_mod[i])
    ge = jnp.zeros(t[0].shape, dtype=bool)
    eq = jnp.ones(t[0].shape, dtype=bool)
    for i in reversed(range(P)):
        h = _U64(plan.half_digits[i])
        ge = ge | (eq & (t[i] > h))
        eq = eq & (t[i] == h)
    c = jnp.where(ge | eq, c - _U64(plan.M_mod), c)
    if log_q == 64:
        return c
    if log_q == 32:
        return c.astype(_U32)
    return c & _U64((1 << log_q) - 1)


# ---------------------------------------------------------------------------
# 2^128 ciphertext modulus (the reference's fft_impl/fft128 role): same CRT
# NTT with a wider prime set; only the reduce/reconstruct ends differ.
# ---------------------------------------------------------------------------


def _reduce_torus128(x128, plan):
    """u128 torus values [..., N, 2] → residues [..., P, N] u64 < p.
    Signed representative: x - 2^128 when hi >= 2^63 equals
    (hi as int64)·2^64 + lo, so hi reduces through the int64 path."""
    hi_s = x128[..., 0].astype(jnp.int64)[..., None, :]          # [..., 1, N]
    lo = x128[..., 1][..., None, :]
    p_i64 = plan.p64.astype(np.int64)                            # [P, 1]
    r_hi = (hi_s % p_i64).astype(_U64)
    r_lo = lo % plan.p64.astype(_U64)
    two64 = np.array([[pow(2, 64, int(p))] for p in plan.primes], dtype=np.uint64)
    return (r_hi * two64 + r_lo) % plan.p64.astype(_U64)


def ntt_forward128(plan: NttPlan, x128) -> jnp.ndarray:
    """u128 torus polynomials [..., N, 2] → spectra [..., P, N] u64 < p."""
    return _dif_forward(plan, _reduce_torus128(x128, plan))


def garner_to_torus128(plan: NttPlan, res) -> jnp.ndarray:
    """CRT residues [..., P, N] → signed-lifted value mod 2^128 [..., N, 2]."""
    from ..u128 import add128, mul_u64_by_u128, sub128, where128

    t, lift = _garner_digits(plan, res)
    c = mul_u64_by_u128(t[0], 0, 1)
    for i in range(1, plan.num_primes):
        pref = plan.prefix_mod128[i]
        c = add128(c, mul_u64_by_u128(t[i], pref >> 64, pref & ((1 << 64) - 1)))
    m = plan.M_mod128
    m_arr = mul_u64_by_u128(jnp.ones((), dtype=_U64), m >> 64, m & ((1 << 64) - 1))
    return where128(lift, sub128(c, m_arr), c)


def negacyclic_polymul128(a128, b, log_bound: float) -> jnp.ndarray:
    """Exact negacyclic product of a u128 polynomial [..., N, 2] with a
    small-integer polynomial [..., N], mod 2^128 (the 128-bit analogue of
    reference polynomial_algorithms.rs wrapping muls, as used by fft128)."""
    n = a128.shape[-2]
    plan = get_plan(n, required_num_primes(log_bound))
    a_hat = ntt_forward128(plan, a128)
    b_hat = ntt_forward(plan, b)
    return garner_to_torus128(
        plan, ntt_inverse(plan, pointwise_mul(plan, a_hat, b_hat)))


def negacyclic_polymul(a, b, log_q: int, log_bound: float | None = None) -> jnp.ndarray:
    """General exact negacyclic product of integer polynomials mod 2^log_q
    (replaces reference `polynomial_karatsuba_wrapping_mul`,
    algorithms/polynomial_algorithms.rs:683).  a, b: [..., N] broadcastable."""
    n = a.shape[-1] if a.ndim else b.shape[-1]
    if log_bound is None:
        log_bound = 2 * 64 + np.log2(n)
    plan = get_plan(n, required_num_primes(log_bound))
    a_hat = ntt_forward(plan, a)
    b_hat = ntt_forward(plan, b)
    return garner_to_torus(plan, ntt_inverse(plan, pointwise_mul(plan, a_hat, b_hat)),
                           log_q)
