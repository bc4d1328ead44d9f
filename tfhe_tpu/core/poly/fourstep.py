"""Four-step CRT-NTT factorization for the MXU (TPU systolic array).

The fused blind-rotation kernel (pallas_ntt.py) is integer-multiply
throughput bound on the VPU: each radix-2 butterfly pass costs a 16-bit-split
Shoup multiply per element, and a full negacyclic NTT is 13 such passes.
This module re-expresses the NTT as the classic four-step factorization
N = N1 x N2 (N2 = 128 = the TPU lane width):

    forward:  blockdiag-matmul over j1  ->  twiddle  ->  dense matmul over j2
    inverse:  dense matmul over k2      ->  twiddle  ->  blockdiag over k1

so the O(N log N) butterfly work becomes two O(N*(N1+N2)) integer matrix
multiplications that run on the MXU as int8 x int8 -> int32 products, and the
VPU only performs one twiddle pass plus a cheap limb recombination per stage.
The negacyclic twist psi^j (and the inverse untwist psi^-j / N) fold into the
stage matrices and twiddle tables, eliminating both of those passes outright.

Modular matmul over 30-bit primes on an 8-bit MXU — the limb scheme:
  * data value v < 2^32 splits into unsigned byte limbs u_k; the kernel feeds
    (u_k - 128) as int8 and a static correction row (128 * row/col sums of the
    weight matrix) restores the true sums after the dot.
  * for each data limb k the 2^{8k} weight folds into the matrix BEFORE limb
    splitting: W(k) = 2^{8k} W mod p, each split into 4 *balanced* signed
    byte limbs m.  The dot then directly yields S_m = sum_k A_k W(k)_m with
    |S_m| <~ 2^24, and the true product is sum_m 2^{8m} S_m (mod p).
  * recombination per element: assemble the exact 48-bit value as
    L + 2^24 H (pure shifts/masks/adds), then two lazy Shoup multiplies by
    the constants 2^24 mod p and 2^16 mod p.  ~10 VPU multiplies per element
    per stage, vs ~42 for the 7 butterfly passes a 128-point stage replaces.

Spectra land in the "digit-transposed" four-step order (position k1*N2+k2
holds frequency k2*N1+k1); `perm_from_dif` maps the DIF bit-reversed spectra
produced by ntt.py into this order, applied once at bootstrap-key conversion.

Reference role: tfhe/src/core_crypto/fft_impl/fft64 (the f64 FFT the
reference uses for these products); the factorization here is the TPU-native
replacement, exact over the CRT primes with zero rounding noise.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

from .ntt import NttPlan, get_plan, shoup as shoup_int

LANES = 128


def _split_nm(n: int) -> tuple[int, int]:
    n2 = min(n, LANES)
    n1 = n // n2
    assert n1 * n2 == n
    return n1, n2


def perm_from_dif(n: int) -> np.ndarray:
    """perm s.t. fourstep_spectrum = dif_spectrum[..., perm].

    ntt.py's DIF forward leaves natural frequency k at position bitrev(k);
    the four-step transform leaves it at position k1*N2 + k2 where
    k = k2*N1 + k1."""
    n1, n2 = _split_nm(n)
    log_n = n.bit_length() - 1
    perm = np.empty(n, dtype=np.int64)
    for s in range(n):
        k1, k2 = divmod(s, n2)
        k = k2 * n1 + k1
        br = int(format(k, f"0{log_n}b")[::-1], 2)
        perm[s] = br
    return perm


class FourStepPlan(NamedTuple):
    """Per-(n, primes) u64 matrices (values < p), psi folds included."""
    n1: int
    n2: int
    w1f: np.ndarray    # [P, N1, N1]  (k1, j1): psi^{N2 j1} w^{N2 j1 k1}
    tf: np.ndarray     # [P, N1, N2]  (k1, j2): psi^{j2} w^{j2 k1}
    w2f: np.ndarray    # [P, N2, N2]  (j2, k2): w^{N1 j2 k2}
    w2i: np.ndarray    # [P, N2, N2]  (k2, j2): w^{-N1 j2 k2}
    ti: np.ndarray     # [P, N1, N2]  (k1, j2): psi^{-j2} w^{-j2 k1}
    w1i: np.ndarray    # [P, N1, N1]  (j1, k1): N^-1 psi^{-N2 j1} w^{-N2 j1 k1}
    perm: np.ndarray   # [N]
    tf_sh: np.ndarray
    ti_sh: np.ndarray


@functools.lru_cache(maxsize=None)
def get_fourstep_plan(n: int, num_primes: int) -> FourStepPlan:
    plan = get_plan(n, num_primes)
    n1, n2 = _split_nm(n)
    P = num_primes

    w1f = np.empty((P, n1, n1), dtype=np.uint64)
    tf = np.empty((P, n1, n2), dtype=np.uint64)
    w2f = np.empty((P, n2, n2), dtype=np.uint64)
    w2i = np.empty((P, n2, n2), dtype=np.uint64)
    ti = np.empty((P, n1, n2), dtype=np.uint64)
    w1i = np.empty((P, n1, n1), dtype=np.uint64)

    for pi, p in enumerate(plan.primes):
        # recover psi from the plan's twist table (twist[j] = psi^j)
        psi = int(plan.twist[0][pi][1]) if n > 1 else 1
        w = (psi * psi) % p
        w_inv = pow(w, p - 2, p)
        psi_inv = pow(psi, p - 2, p)
        n_inv = pow(n, p - 2, p)
        for j1 in range(n1):
            a = pow(psi, n2 * j1, p)
            b = pow(w, n2 * j1, p)
            ai = (pow(psi_inv, n2 * j1, p) * n_inv) % p
            bi = pow(w_inv, n2 * j1, p)
            for k1 in range(n1):
                w1f[pi, k1, j1] = (a * pow(b, k1, p)) % p
                w1i[pi, j1, k1] = (ai * pow(bi, k1, p)) % p
        for k1 in range(n1):
            for j2 in range(n2):
                tf[pi, k1, j2] = (pow(psi, j2, p) * pow(w, j2 * k1, p)) % p
                ti[pi, k1, j2] = (pow(psi_inv, j2, p) * pow(w_inv, j2 * k1, p)) % p
        for j2 in range(n2):
            wj = pow(w, n1 * j2, p)
            wji = pow(w_inv, n1 * j2, p)
            for k2 in range(n2):
                w2f[pi, j2, k2] = pow(wj, k2, p)
                w2i[pi, k2, j2] = pow(wji, k2, p)

    def sh(arr):
        out = np.empty_like(arr)
        for pi, p in enumerate(plan.primes):
            out[pi] = (arr[pi].astype(object) << 32) // p
        return out

    return FourStepPlan(n1=n1, n2=n2, w1f=w1f, tf=tf, w2f=w2f, w2i=w2i,
                        ti=ti, w1i=w1i, perm=perm_from_dif(n),
                        tf_sh=sh(tf), ti_sh=sh(ti))


# ---------------------------------------------------------------------------
# u64 reference transforms (test-only; the hot path is the Pallas kernel)
# ---------------------------------------------------------------------------


def _matmul_mod(a, b, p):
    """(a @ b) mod p for u64 residue arrays: products reduced before the sum
    (sum of <=128 values < 2^60 overflows u64 otherwise)."""
    prod = (a[..., :, :, None] * b[..., None, :, :]) % p[..., None, None, None]
    return prod.sum(axis=-2) % p[..., None, None]


def fourstep_forward_ref(n: int, num_primes: int, res):
    """Residues [..., P, N] u64 (< p) -> four-step spectra [..., P, N]."""
    fp = get_fourstep_plan(n, num_primes)
    plan = get_plan(n, num_primes)
    p = np.asarray(plan.p64[:, 0])
    v = np.asarray(res).reshape(res.shape[:-1] + (fp.n1, fp.n2))
    # stage A: out[k1, j2] = sum_j1 w1f[k1, j1] v[j1, j2]
    a = _matmul_mod(fp.w1f, v, p)
    b = (a * fp.tf) % p[..., None, None]
    c = _matmul_mod(b, fp.w2f, p)
    return c.reshape(res.shape)


def fourstep_inverse_ref(n: int, num_primes: int, spec):
    """Four-step spectra [..., P, N] -> coefficient residues [..., P, N]."""
    fp = get_fourstep_plan(n, num_primes)
    plan = get_plan(n, num_primes)
    p = np.asarray(plan.p64[:, 0])
    c = np.asarray(spec).reshape(spec.shape[:-1] + (fp.n1, fp.n2))
    d = _matmul_mod(c, np.swapaxes(fp.w2i, -2, -1), p)  # sum_k2 C[k1,k2] w2i[k2,j2]
    e = (d * fp.ti) % p[..., None, None]
    x = _matmul_mod(fp.w1i, e, p)
    return x.reshape(spec.shape)


# ---------------------------------------------------------------------------
# int8 limb machinery for the Pallas kernel
# ---------------------------------------------------------------------------

BIAS = 1 << 25          # recombination bias making S'_m nonnegative
BIAS_SUM = BIAS * 0x01010101   # sum_m 2^{8m} * BIAS


def balanced_i8_limbs(mat: np.ndarray, num_limbs: int = 4) -> list[np.ndarray]:
    """Exact balanced signed base-256 digits: sum_k limbs[k] 2^{8k} == mat."""
    v = mat.astype(np.int64)
    limbs = []
    for _ in range(num_limbs):
        lo = v & 255
        v = v >> 8
        carry = lo >= 128
        lo = lo - 256 * carry
        v = v + carry
        limbs.append(lo.astype(np.int8))
    assert np.all(v == 0), "value exceeds limb range"
    return limbs


def _weight_stack_left(w_mod: np.ndarray, p: int, bt: int, k_limbs: int):
    """Blockdiag LEFT weight stack for out = W @ data (contraction over data
    rows within each batch block).

    w_mod [M, K] (values < p) -> (stack int8 [4*bt*M, k_limbs*bt*K],
    corr int32 [4, M, 1] = 128*rowsums + BIAS)."""
    M, K = w_mod.shape
    core = np.zeros((4, M, k_limbs, K), dtype=np.int8)
    for k in range(k_limbs):
        wk = (w_mod.astype(object) * (1 << (8 * k))) % p
        for m, limb in enumerate(balanced_i8_limbs(wk.astype(np.uint64))):
            core[m, :, k, :] = limb
    # corr: 128 * sum over (k, j) of the m-limb (b-independent)
    corr = (128 * core.astype(np.int64).sum(axis=(2, 3)) + BIAS).astype(np.int64)
    assert np.all(np.abs(corr) < (1 << 31))
    eye = np.eye(bt, dtype=np.int8)
    # [4, bt, M, k, bt, K] with delta_bb'
    stack = np.einsum('mjkl,bc->mbjkcl', core, eye)
    stack = stack.reshape(4 * bt * M, k_limbs * bt * K).astype(np.int8)
    return stack, corr.astype(np.int32)[:, :, None]


def _weight_stack_right(w_mod: np.ndarray, p: int, k_limbs: int = 4):
    """Dense RIGHT weight stack for out = data @ W (contraction over lanes).

    w_mod [K, M] -> (stack int8 [k_limbs*K, 4*M], corr int32 [4, 1, M])."""
    K, M = w_mod.shape
    stack = np.zeros((k_limbs, K, 4, M), dtype=np.int8)
    for k in range(k_limbs):
        wk = (w_mod.astype(object) * (1 << (8 * k))) % p
        for m, limb in enumerate(balanced_i8_limbs(wk.astype(np.uint64))):
            stack[k, :, m, :] = limb
    corr = (128 * stack.astype(np.int64).sum(axis=(0, 1)) + BIAS)
    assert np.all(np.abs(corr) < (1 << 31))
    return (stack.reshape(k_limbs * K, 4 * M).astype(np.int8),
            corr.astype(np.int32)[:, None, :])


class FourStepKernelTables(NamedTuple):
    """Everything the MXU step kernel closes over, per (n, primes, bt).

    Shapes (P primes, N = N1*N2, rows = bt*N1):
      wfa  [P, 4*rows, 3*rows]   fwd stage A (blockdiag, digit data, 3 limbs)
      ca   [P, 4, N1, 1]         its corr (+BIAS)
      da   [P, N1, 1]            fwd A final-fold constant (digit offset+bias)
      tf   [P, N1, N2] (x2)      middle twiddle (+ shoup)
      wfb  [P, 4*N2, 4*N2]       fwd stage B (dense, u32 data, 4 limbs)
      cb   [P, 4, 1, N2]         its corr
      wia  [P, 4*N2, 4*N2]       inv stage A (dense)
      cia  [P, 4, 1, N2]
      ti   [P, N1, N2] (x2)
      wib  [P, 4*rows, 4*rows]   inv stage B (blockdiag)
      cib  [P, 4, N1, 1]
      dib  [P, N1, 1]            inv B final-fold constant (bias only; psi/N
                                 folds live in the matrices)
    """
    wfa: np.ndarray
    ca: np.ndarray
    da: np.ndarray
    tf: np.ndarray
    tf_sh: np.ndarray
    wfb: np.ndarray
    cb: np.ndarray
    wia: np.ndarray
    cia: np.ndarray
    ti: np.ndarray
    ti_sh: np.ndarray
    wib: np.ndarray
    cib: np.ndarray
    dib: np.ndarray


DIGIT_OFF = 1 << 23     # digits are made nonnegative as d + DIGIT_OFF


@functools.lru_cache(maxsize=None)
def get_kernel_tables(n: int, num_primes: int, bt: int) -> FourStepKernelTables:
    fp = get_fourstep_plan(n, num_primes)
    plan = get_plan(n, num_primes)
    n1, n2 = fp.n1, fp.n2
    P = num_primes
    rows = bt * n1

    wfa = np.empty((P, 4 * rows, 3 * rows), dtype=np.int8)
    ca = np.empty((P, 4, n1, 1), dtype=np.int32)
    da = np.empty((P, n1, 1), dtype=np.uint32)
    wfb = np.empty((P, 4 * n2, 4 * n2), dtype=np.int8)
    cb = np.empty((P, 4, 1, n2), dtype=np.int32)
    wia = np.empty((P, 4 * n2, 4 * n2), dtype=np.int8)
    cia = np.empty((P, 4, 1, n2), dtype=np.int32)
    wib = np.empty((P, 4 * rows, 4 * rows), dtype=np.int8)
    cib = np.empty((P, 4, n1, 1), dtype=np.int32)
    dib = np.empty((P, n1, 1), dtype=np.uint32)

    for pi, p in enumerate(plan.primes):
        wfa[pi], ca[pi] = _weight_stack_left(fp.w1f[pi], p, bt, 3)
        rowsum = fp.w1f[pi].astype(object).sum(axis=1)
        da[pi, :, 0] = np.array(
            [int((-DIGIT_OFF * int(r) - BIAS_SUM) % p) for r in rowsum],
            dtype=np.uint32)
        wfb[pi], cb[pi] = _weight_stack_right(fp.w2f[pi], p)
        wia[pi], cia[pi] = _weight_stack_right(fp.w2i[pi], p)
        wib[pi], cib[pi] = _weight_stack_left(fp.w1i[pi], p, bt, 4)
        dib[pi, :, 0] = np.uint32((-BIAS_SUM) % p)

    u32 = lambda a: a.astype(np.uint32)
    return FourStepKernelTables(
        wfa=wfa, ca=ca, da=da,
        tf=u32(fp.tf), tf_sh=u32(fp.tf_sh),
        wfb=wfb, cb=cb, wia=wia, cia=cia,
        ti=u32(fp.ti), ti_sh=u32(fp.ti_sh),
        wib=wib, cib=cib, dib=dib)


# recombination scalar constants per prime
def recomb_consts(p: int) -> tuple[int, int, int, int]:
    c24 = (1 << 24) % p
    c16 = (1 << 16) % p
    return c24, shoup_int(c24, p), c16, shoup_int(c16, p)


class FourStepLanesTables(NamedTuple):
    """Tables for the "lanes" kernel layout: polynomials live as
    [N1, bt*N2] (batch folded into the lane dimension), so the N1-contraction
    stages are DENSE [.., 3|4*N1] matmuls shared by the whole batch tile —
    no block-diagonal batch embedding, hence no bt-times redundant MXU work.

    Forward stage A additionally stacks PRIME PAIRS along the output rows
    (the digit-limb input is prime-independent), filling the MXU's 128-row
    tile: wfa [n_pairs, pair_size*4*N1, 3*N1].

      wfa  [n_pairs, ps*4*N1, 3*N1]   ca [n_pairs, ps, 4, N1, 1]
      da   [P, N1, 1]                 fwd A final-fold constants
      tf_t [P, N1, bt*N2] (x2)        middle twiddle TILED along lanes
      wfb  [P, 4*N2, 4*N2]  cb [P, 4, 1, N2]     (dense, unchanged)
      wia  [P, 4*N2, 4*N2]  cia [P, 4, 1, N2]
      ti   [P, N1, N2] (x2)           untiled (applied in rows-(k1,b) layout)
      wib  [P, 4*N1, 4*N1]  cib [P, 4, N1, 1]  dib [P, N1, 1]
    """
    pairs: tuple
    wfa: np.ndarray
    ca: np.ndarray
    da: np.ndarray
    tf_t: np.ndarray
    tf_sh_t: np.ndarray
    wfb: np.ndarray
    cb: np.ndarray
    wia: np.ndarray
    cia: np.ndarray
    ti: np.ndarray
    ti_sh: np.ndarray
    wib: np.ndarray
    cib: np.ndarray
    dib: np.ndarray


@functools.lru_cache(maxsize=None)
def get_kernel_tables_lanes(n: int, num_primes: int,
                            bt: int) -> FourStepLanesTables:
    fp = get_fourstep_plan(n, num_primes)
    plan = get_plan(n, num_primes)
    n1, n2 = fp.n1, fp.n2
    P = num_primes
    pairs = tuple((i, i + 1) if i + 1 < P else (i,)
                  for i in range(0, P, 2))
    ps = len(pairs[0])

    wfa = np.zeros((len(pairs), ps * 4 * n1, 3 * n1), dtype=np.int8)
    ca = np.zeros((len(pairs), ps, 4, n1, 1), dtype=np.int32)
    da = np.empty((P, n1, 1), dtype=np.uint32)
    wfb = np.empty((P, 4 * n2, 4 * n2), dtype=np.int8)
    cb = np.empty((P, 4, 1, n2), dtype=np.int32)
    wia = np.empty((P, 4 * n2, 4 * n2), dtype=np.int8)
    cia = np.empty((P, 4, 1, n2), dtype=np.int32)
    wib = np.empty((P, 4 * n1, 4 * n1), dtype=np.int8)
    cib = np.empty((P, 4, n1, 1), dtype=np.int32)
    dib = np.empty((P, n1, 1), dtype=np.uint32)

    for pp, pair in enumerate(pairs):
        for which, pi in enumerate(pair):
            p = int(plan.primes[pi])
            stack, corr = _weight_stack_left(fp.w1f[pi], p, 1, 3)
            wfa[pp, which * 4 * n1:(which + 1) * 4 * n1] = stack
            ca[pp, which] = corr
    for pi, p in enumerate(plan.primes):
        p = int(p)
        rowsum = fp.w1f[pi].astype(object).sum(axis=1)
        da[pi, :, 0] = np.array(
            [int((-DIGIT_OFF * int(r) - BIAS_SUM) % p) for r in rowsum],
            dtype=np.uint32)
        wfb[pi], cb[pi] = _weight_stack_right(fp.w2f[pi], p)
        wia[pi], cia[pi] = _weight_stack_right(fp.w2i[pi], p)
        wib[pi], cib[pi] = _weight_stack_left(fp.w1i[pi], p, 1, 4)
        dib[pi, :, 0] = np.uint32((-BIAS_SUM) % p)

    u32 = lambda a: a.astype(np.uint32)
    tf_t = np.tile(u32(fp.tf), (1, 1, bt))
    tf_sh_t = np.tile(u32(fp.tf_sh), (1, 1, bt))
    return FourStepLanesTables(
        pairs=pairs, wfa=wfa, ca=ca, da=da, tf_t=tf_t, tf_sh_t=tf_sh_t,
        wfb=wfb, cb=cb, wia=wia, cia=cia,
        ti=u32(fp.ti), ti_sh=u32(fp.ti_sh), wib=wib, cib=cib, dib=dib)


# ---------------------------------------------------------------------------
# monomial-phase tables in four-step order (radix-4 exponentiation)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def monomial_full_tables_lanes(n: int, num_primes: int, minus_one: bool):
    """monomial_full_tables in [P, N1, 2n, N2] layout: gathering exponent e
    on axis 2 yields [P, N1, B, N2] directly — the "lanes" kernel's phase
    block layout — with no XLA-side transpose after the gather."""
    tab, sh = monomial_full_tables(n, num_primes, minus_one)
    return (np.ascontiguousarray(tab.transpose(1, 2, 0, 3)),
            np.ascontiguousarray(sh.transpose(1, 2, 0, 3)))


@functools.lru_cache(maxsize=None)
def monomial_full_tables(n: int, num_primes: int, minus_one: bool):
    """Spectra (four-step order) of X^e — or (X^e - 1) when minus_one — for
    EVERY exponent e in [0, 2n): u32 [2n, P, N1, N2], plus the Shoup twin.

    The table lives in HBM (~128 MB per array at N = 2048, P = 4); the
    blind-rotation driver gathers one row per (batch element, step) by the
    mod-switched exponent.  This replaces the in-kernel radix-4
    exponentiation ladder outright and gives every phase a precomputed Shoup
    quotient, so the kernel's phase multiplies are all lazy Shoup multiplies
    (4 VPU multiplies) instead of generic double-width ones.

    X^e evaluates to psi^{e(2k+1)} at frequency k; position (k1, k2) holds
    frequency k2*N1 + k1.  The minus_one form backs the delta-CMUX classic
    step  acc += iNTT((X^a - 1)-phase * (GGSW(s) spectral-MAC acc))."""
    plan = get_plan(n, num_primes)
    n1, n2 = _split_nm(n)
    P = num_primes
    k1g, k2g = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    kfreq = (k2g * n1 + k1g).reshape(-1).astype(np.int64)        # [N]
    e = np.arange(2 * n, dtype=np.int64)
    idx = (e[:, None] * (2 * kfreq[None, :] + 1)) % (2 * n)      # [2n, N]
    tab = np.empty((2 * n, P, n), dtype=np.uint32)
    sh = np.empty_like(tab)
    for pi, p in enumerate(plan.primes):
        p = int(p)
        psi = int(plan.twist[0][pi][1]) if n > 1 else 1
        pows = np.empty(2 * n, dtype=np.uint64)
        acc = 1
        for ee in range(2 * n):
            pows[ee] = acc
            acc = (acc * psi) % p
        v = pows[idx]                                            # [2n, N] u64
        if minus_one:
            v = (v + np.uint64(p - 1)) % np.uint64(p)
        tab[:, pi] = v.astype(np.uint32)
        sh[:, pi] = ((v << np.uint64(32)) // np.uint64(p)).astype(np.uint32)
    return (tab.reshape(2 * n, P, n1, n2), sh.reshape(2 * n, P, n1, n2))


# Above this polynomial size the full-exponent table is factored into
# X^{e_lo} / X^{S e_hi} halves (the O(N^2) full table would be 17+ GB of
# HBM at N=16384 and 64 GB at N=32768); the kernel multiplies the two
# gathered rows into the accumulator with two lazy Shoup multiplies.
MONO_SPLIT_MIN_N = 16384


def monomial_split_log_s(n: int) -> int:
    """log2 of the low-table size S ~= sqrt(2n)."""
    return (int(np.log2(2 * n)) + 1) // 2


@functools.lru_cache(maxsize=None)
def monomial_split_tables(n: int, num_primes: int):
    """Factored phase tables: rows [0, S) hold the spectra of X^{e_lo},
    rows [S, S + 2n/S) hold X^{S * e_hi} — stacked into ONE
    [S + 2n/S, P, N1, N2] u32 array (+ Shoup twin) so the existing
    single-table DMA plumbing carries both halves.  X^e = X^{e_lo} *
    X^{S e_hi}; the delta-CMUX's (X^e - 1) factor becomes an explicit
    in-kernel subtract of the unphased spectrum (pallas_ntt.py).
    Kills the O(N^2) table budget: 64 GB -> 0.5 GB at N=32768."""
    plan = get_plan(n, num_primes)
    n1, n2 = _split_nm(n)
    P = num_primes
    log_s = monomial_split_log_s(n)
    S = 1 << log_s
    n_hi = (2 * n) // S
    k1g, k2g = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    kfreq = (k2g * n1 + k1g).reshape(-1).astype(np.int64)        # [N]
    tab = np.empty((S + n_hi, P, n), dtype=np.uint32)
    sh = np.empty_like(tab)
    exps = np.concatenate([np.arange(S, dtype=np.int64),
                           np.arange(n_hi, dtype=np.int64) * S])
    idx = (exps[:, None] * (2 * kfreq[None, :] + 1)) % (2 * n)
    for pi, p in enumerate(plan.primes):
        p = int(p)
        psi = int(plan.twist[0][pi][1]) if n > 1 else 1
        pows = np.empty(2 * n, dtype=np.uint64)
        acc = 1
        for ee in range(2 * n):
            pows[ee] = acc
            acc = (acc * psi) % p
        v = pows[idx]                                            # [S+n_hi, N]
        tab[:, pi] = v.astype(np.uint32)
        sh[:, pi] = ((v << np.uint64(32)) // np.uint64(p)).astype(np.uint32)
    return (tab.reshape(S + n_hi, P, n1, n2),
            sh.reshape(S + n_hi, P, n1, n2))


def monomial_tables_for(n: int, num_primes: int, minus_one: bool,
                        lanes: bool = False):
    """The phase tables the fused kernel uses for this N: the full
    [2n, ...] (X^e - 1 | X^e) table below MONO_SPLIT_MIN_N, the factored
    stack above it.  Single source of truth for keygen (encryption.py) and
    the serializer's derived-field regeneration (utils/serialization.py)."""
    if n >= MONO_SPLIT_MIN_N:
        assert not lanes, "lanes layout has no factored phase tables"
        return monomial_split_tables(n, num_primes)
    if lanes:
        return monomial_full_tables_lanes(n, num_primes, minus_one)
    return monomial_full_tables(n, num_primes, minus_one)


@functools.lru_cache(maxsize=None)
def monomial_tables_fourstep(n: int, num_primes: int):
    """Spectra of X^(v * 4^lvl) (v in 1..3) in four-step order, u32 + shoup:
    [L4, 3, P, N1, N2].  X^e evaluates to psi^{e(2k+1)} at frequency k;
    position (k1, k2) holds frequency k2*N1 + k1."""
    plan = get_plan(n, num_primes)
    fp = get_fourstep_plan(n, num_primes)
    n1, n2 = fp.n1, fp.n2
    nb = int(np.log2(2 * n))
    l4 = (nb + 1) // 2
    P = num_primes
    tab = np.empty((l4, 3, P, n1, n2), dtype=np.uint64)
    sh = np.empty_like(tab)
    # frequency index per position (k1, k2)
    k1g, k2g = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    kfreq = (k2g * n1 + k1g).astype(np.int64)
    for pi, p in enumerate(plan.primes):
        psi = int(plan.twist[0][pi][1]) if n > 1 else 1
        pows = np.empty(2 * n, dtype=np.uint64)      # psi^e for e < 2n
        acc = 1
        for e in range(2 * n):
            pows[e] = acc
            acc = (acc * psi) % p
        pow_sh = ((pows.astype(object) << 32) // p).astype(np.uint64)
        for lvl in range(l4):
            for v in (1, 2, 3):
                e = (v << (2 * lvl)) % (2 * n)
                idx = (e * (2 * kfreq + 1)) % (2 * n)
                tab[lvl, v - 1, pi] = pows[idx]
                sh[lvl, v - 1, pi] = pow_sh[idx]
    return tab.astype(np.uint32), sh.astype(np.uint32)
