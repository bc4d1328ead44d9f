"""Fused Pallas TPU kernel for the blind-rotation step.

The XLA path (bootstrap.py) is correct but HBM-bound: every butterfly stage
materializes its operands.  This kernel fuses the ENTIRE external-product
step — digit decomposition → forward CRT-NTT → monomial phase → MAC against
the paired bootstrap key → inverse NTT → Garner CRT → accumulator update —
in VMEM, so per step the only HBM traffic is the accumulator tile and the
BSK slice.

Key design points (all forced by the hardware/probe results):
  * Mosaic has no 64-bit integers → the torus accumulator travels as
    (hi, lo) uint32 planes; all modular arithmetic is uint32 with 16-bit
    split mulhi (6 multiplies per Shoup modular multiplication).
  * No coefficient-space rotation: the blind-rotation monomial X^ã is a
    pointwise phase in the NTT domain applied to the *digit spectra*, against
    the paired key (GGSW(1-s), GGSW(s)) — see
    encryption.bootstrap_key_to_ntt_paired.  This removes the per-step
    gather entirely:   acc ← (pair0 + X^ã · pair1) ⊡ acc.
  * Butterflies are lane-uniform: partner access via pltpu.roll(±h) and a
    static parity mask, twiddles pre-expanded to full-length [P, N] vectors
    per stage (1 at lo positions) — every stage costs the same handful of
    vector ops regardless of stride.

The same scrambled DIF/DIT ordering as poly/ntt.py is used, so spectra
interoperate with the XLA-side tables (BSK, monomial powers).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..decomposition import signed_decompose  # noqa: F401 (XLA fallback parity)
from ..params import DecompParams
from .ntt import NttPlan, get_plan, shoup as shoup_int


def _lut_full(lut_data, batch, flat_b: int, pad: int):
    """Accumulator rows for the whole (padded, flattened) batch.

    lut_data is either a shared [R, N] LUT or per-element [..., R, N] LUTs
    whose batch dims broadcast against the LWE batch (the integer layer
    stacks DISTINCT per-block LUTs onto the PBS batch axis — reference
    many-LUT PBS, e.g. full_propagate's (message, carry) pair and mul's
    lsb/msb partials).  Returns [flat_b + pad, R, N]."""
    if lut_data.ndim == 2:
        return jnp.broadcast_to(lut_data,
                                (flat_b + pad,) + lut_data.shape[-2:])
    full = jnp.broadcast_to(lut_data, tuple(batch) + lut_data.shape[-2:])
    full = full.reshape((flat_b,) + lut_data.shape[-2:])
    if pad:
        full = jnp.concatenate(
            [full, jnp.zeros((pad,) + full.shape[1:], full.dtype)], axis=0)
    return full


def _padded_flat_batch(flat_b: int, bt: int) -> int:
    """Flat batch size after padding: a multiple of the kernel tile `bt`,
    rounded up into the geometric bucket set {2^k, 3·2^{k-1}} once above
    4 tiles (config.bucket_pbs_batch) so that distinct logical batch sizes
    share compiled kernel grids.  Each distinct padded batch is a separate
    multi-minute TPU compile through the remote tunnel, and the integer
    layer stacks varying radix-block counts onto this axis (reference
    rayon fan-outs, integer/server_key/radix_parallel/) — bucketing caps
    the compile count at 2 per batch octave with ≤1.5x padding overhead."""
    from ... import config as _config

    flat_b, bt = max(flat_b, 1), max(bt, 1)
    tiled = flat_b + ((-flat_b) % bt)
    if not _config.bucket_pbs_batch() or tiled <= 4 * bt:
        return tiled
    k = 1 << (tiled - 1).bit_length()          # next power of two >= tiled
    bucket = (3 * k) // 4 if tiled <= (3 * k) // 4 else k
    return bucket + ((-bucket) % bt)

U32 = jnp.uint32
I32 = jnp.int32


# ---------------------------------------------------------------------------
# table construction (host, numpy)
# ---------------------------------------------------------------------------


class StepTables(NamedTuple):
    twist: np.ndarray        # [P, N] u32
    twist_sh: np.ndarray
    fwd: np.ndarray          # [log_n, P, N] u32 (1 at lo positions)
    fwd_sh: np.ndarray
    inv: np.ndarray          # [log_n, P, N]
    inv_sh: np.ndarray
    untwist: np.ndarray      # [P, N]
    untwist_sh: np.ndarray
    mono: np.ndarray         # [log_2n, P, N]
    mono_sh: np.ndarray


@functools.lru_cache(maxsize=None)
def build_step_tables(n: int, num_primes: int) -> StepTables:
    plan = get_plan(n, num_primes)
    log_n = plan.log_n
    P = num_primes

    def expand(vals_fn, m_of_st):
        out = np.ones((log_n, P, n), dtype=np.uint64)
        for st in range(log_n):
            m = m_of_st(st)
            h = m // 2
            for pi in range(P):
                w_tab = vals_fn(st)[0][pi]       # [h]
                for j in range(n):
                    pos = j % m
                    if pos >= h:
                        out[st, pi, j] = w_tab[pos - h]
        return out

    fwd = expand(lambda st: plan.fwd_w[st], lambda st: n >> st)
    inv = expand(lambda st: plan.inv_w[st], lambda st: 2 << st)

    def sh_of(arr):
        out = np.empty_like(arr)
        for pi, p in enumerate(plan.primes):
            a = arr[..., pi, :].astype(object)
            out[..., pi, :] = np.array(
                [[ (int(x) << 32) // p for x in row] for row in np.atleast_2d(a)],
                dtype=np.uint64).reshape(a.shape)
        return out

    twist = plan.twist[0]
    untwist = plan.untwist[0]
    from ..algorithms.multi_bit import _monomial_pow_tables
    mono, mono_sh = _monomial_pow_tables(n, num_primes)

    def u32(a):
        return a.astype(np.uint32)

    return StepTables(
        twist=u32(twist), twist_sh=u32(plan.twist[1]),
        fwd=u32(fwd), fwd_sh=u32(sh_of(fwd)),
        inv=u32(inv), inv_sh=u32(sh_of(inv)),
        untwist=u32(untwist), untwist_sh=u32(plan.untwist[1]),
        mono=u32(mono), mono_sh=u32(mono_sh))


# ---------------------------------------------------------------------------
# in-kernel u32 modular primitives
# ---------------------------------------------------------------------------


def _mulhi32(a, b):
    """High 32 bits of u32 × u32 via 16-bit split (4 multiplies)."""
    a0 = a & U32(0xFFFF)
    a1 = a >> U32(16)
    b0 = b & U32(0xFFFF)
    b1 = b >> U32(16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    t = (p00 >> U32(16)) + (p01 & U32(0xFFFF)) + (p10 & U32(0xFFFF))
    return p11 + (p01 >> U32(16)) + (p10 >> U32(16)) + (t >> U32(16))


def _mulhi32_approx(a, b):
    """mulhi within [-2, 0] of the true value (drops the low-product carry):
    3 multiplies instead of 4 — valid for Shoup quotients, where the caller
    absorbs the error with extra conditional subtractions."""
    a0 = a & U32(0xFFFF)
    a1 = a >> U32(16)
    b0 = b & U32(0xFFFF)
    b1 = b >> U32(16)
    return a1 * b1 + ((a1 * b0) >> U32(16)) + ((a0 * b1) >> U32(16))


def _mulmod(a, w, ws, p):
    """Shoup: a*w mod p; a < 2^32, w < p < 2^30. 5 multiplies, no division.
    q̂ ∈ [q-2, q] ⇒ r < 4p < 2^32: two conditional subtractions → r < p."""
    q = _mulhi32_approx(a, ws)
    r = a * w - q * p
    two_p = p + p
    r = jnp.where(r >= two_p, r - two_p, r)
    return jnp.where(r >= p, r - p, r)


def _condsub2p(r, p):
    two_p = p + p
    return jnp.where(r >= two_p, r - two_p, r)


def _mulmod_lazy(a, w, ws, p):
    """Harvey-style lazy Shoup multiply: one conditional subtraction instead
    of two.  For a < 4p (< 2^32 with 30-bit primes): exact quotient gives
    r ≤ 2p, the approximate mulhi adds < 2p ⇒ r < 4p, one condsub ⇒ r < 2p.
    The NTT butterflies keep every intermediate < 2p under this rule and
    only reduce fully (< p) at the untwist, saving ~3 VPU ops per modmul on
    the hottest passes."""
    q = _mulhi32_approx(a, ws)
    r = a * w - q * p
    return _condsub2p(r, p)


def _addmod(a, b, p):
    s = a + b
    return jnp.where(s >= p, s - p, s)


def _submod(a, b, p):
    return jnp.where(a >= b, a - b, a + p - b)


# ---------------------------------------------------------------------------
# the fused step kernel
# ---------------------------------------------------------------------------


def _make_step_kernel(n: int, num_primes: int, glwe_size: int,
                      decomp: DecompParams, primes, log_q: int = 64,
                      interpret: bool = False, grouping: int = 1):
    G = grouping
    V = 1 << G
    if interpret:
        def roll(v, sh):
            return jnp.roll(v, sh, axis=1)

        def roll_dyn(v, sh):
            return jnp.roll(v, sh, axis=1)
    else:
        def roll(v, sh):
            # x64 mode promotes python ints to i64; Mosaic's dynamic_rotate
            # requires an i32 amount
            return pltpu.roll(v, jnp.int32(sh % n), 1)

        def roll_dyn(v, sh):   # traced shift (already i32, in [0, n))
            return pltpu.roll(v, sh, 1)

    log_n = n.bit_length() - 1
    log_2n = log_n + 1
    P = num_primes
    R = glwe_size
    L = decomp.level
    J = L * R
    B_log = decomp.base_log
    base = 1 << B_log
    half_base = base >> 1
    shift = log_q - B_log * L
    assert shift >= 32, "decomposition must keep >= 32 low bits (all named sets do)"
    plan = get_plan(n, num_primes)
    # Garner constants as u32 python ints
    g_hinv = _garner_consts(primes)
    prefix = [(int(x) >> 32, int(x) & 0xFFFFFFFF) for x in plan.prefix_mod]
    m_mod = (plan.M_mod >> 32, plan.M_mod & 0xFFFFFFFF)
    half_digits = [int(x) for x in plan.half_digits]

    def kernel(a_ref, acc_hi_ref, acc_lo_ref, bsk_ref, bsk_sh_ref,
               twist_ref, twist_sh_ref, fwd_ref, fwd_sh_ref,
               inv_ref, inv_sh_ref, untw_ref, untw_sh_ref,
               mono_ref, mono_sh_ref,
               out_hi_ref, out_lo_ref):
        lane = jax.lax.broadcasted_iota(I32, (1, n), 1)

        def vec(x):          # keep per-prime table rows 2D for Mosaic
            return x.reshape(1, n)

        # ---- 1. decompose the accumulator from (hi, lo) -------------------
        # digits[l][r]: int32 [Bt, N], level index l has weight q/B^(l+1)
        digits = [[None] * R for _ in range(L)]
        for r in range(R):
            hi = acc_hi_ref[:, r, :]
            lo = acc_lo_ref[:, r, :]
            if shift - 1 >= 32:
                hi_r = hi + U32(1 << (shift - 1 - 32))
            else:  # shift == 32
                carry = (lo >= U32(0x80000000)).astype(U32)
                hi_r = hi + carry
            s = hi_r >> U32(shift - 32) if shift > 32 else hi_r
            for li in range(L - 1, -1, -1):   # LSB-first extraction
                raw = s & U32(base - 1)
                carry = (raw + U32(half_base)) >> U32(B_log)
                d = raw.astype(I32) - (carry.astype(I32) << B_log)
                s = (s >> U32(B_log)) + carry
                digits[li][r] = d

        # ---- 2. forward NTT of digits, per prime --------------------------
        # d_hat[p][j] u32 [Bt, N]
        d_hat = [[None] * J for _ in range(P)]
        for pi in range(P):
            p = U32(primes[pi])
            for li in range(L):
                for r in range(R):
                    d = digits[li][r]
                    v = jnp.where(d < 0, d + primes[pi], d).astype(U32)
                    # lazy invariant: every butterfly value stays < 2p
                    v = _mulmod_lazy(v, vec(twist_ref[pi, :]),
                                     vec(twist_sh_ref[pi, :]), p)

                    def fwd_stage(st, v, pi=pi, p=p):
                        m = jnp.int32(n) >> st
                        h = m >> 1
                        is_lo = (lane & (m - 1)) < h
                        part_m = roll_dyn(v, jnp.int32(n) - h)   # v[j+h]
                        part_p = roll_dyn(v, h)                  # v[j-h]
                        lo_new = _condsub2p(v + part_m, p)
                        hi_new = _mulmod_lazy(part_p + (p + p) - v,
                                              vec(fwd_ref[st, pi, :]),
                                              vec(fwd_sh_ref[st, pi, :]), p)
                        return jnp.where(is_lo, lo_new, hi_new)

                    v = jax.lax.fori_loop(jnp.int32(0), jnp.int32(log_n), fwd_stage, v)
                    d_hat[pi][li * R + r] = v

        # ---- 3. monomial phases X^(c_v) per prime --------------------------
        # One binary-exponentiation phase per group bit; composite subsets are
        # products of the single-bit phases (the paired-classic case is g = 1).
        bit_pows = [[None] * G for _ in range(P)]   # [P][g] each [Bt, N]
        for pi in range(P):
            p = U32(primes[pi])
            for gi in range(G):
                a_val = a_ref[:, gi:gi + 1]         # [Bt, 1] int32
                acc_w = jnp.ones((a_ref.shape[0], n), dtype=U32)
                for b in range(log_2n):
                    bit = ((a_val >> b) & 1) != 0
                    mult = _mulmod(acc_w, vec(mono_ref[b, pi, :]),
                                   vec(mono_sh_ref[b, pi, :]), p)
                    acc_w = jnp.where(bit, mult, acc_w)
                bit_pows[pi][gi] = acc_w

        # ---- 4. MAC over the 2^g GGSW variants -----------------------------
        # GGSW_eff = Σ_v X^{c_v}·GGSW_v ;  spec = Σ_v (d_hat·phase_v)·bsk_v
        # v bit order matches the multibit BSK: MSB of v ↔ first group bit.
        spec = [[None] * R for _ in range(P)]
        for pi in range(P):
            p = U32(primes[pi])
            phases = {0: None}                      # v -> phase array or None(=1)
            for v in range(1, V):
                ph = None
                for gi in range(G):
                    if (v >> (G - 1 - gi)) & 1:
                        ph = (bit_pows[pi][gi] if ph is None else
                              _mulmod_generic(ph, bit_pows[pi][gi], p, primes[pi]))
                phases[v] = ph
            for v in range(V):
                ph = phases[v]
                d_use = (d_hat[pi] if ph is None else
                         [_mulmod_generic(d_hat[pi][j], ph, p, primes[pi])
                          for j in range(J)])
                for r in range(R):
                    acc_s = spec[pi][r]
                    for j in range(J):
                        # d_use any u32 (lazy and generic both accept it)
                        t0 = _mulmod_lazy(d_use[j], vec(bsk_ref[v, pi, j, r, :]),
                                          vec(bsk_sh_ref[v, pi, j, r, :]), p)
                        acc_s = t0 if acc_s is None else _condsub2p(acc_s + t0, p)
                    spec[pi][r] = acc_s

        # ---- 5. inverse NTT + untwist -------------------------------------
        res = [[None] * R for _ in range(P)]
        for pi in range(P):
            p = U32(primes[pi])
            for r in range(R):
                v = spec[pi][r]

                def inv_stage(st, v, pi=pi, p=p):
                    m = jnp.int32(2) << st
                    h = m >> 1
                    is_lo = (lane & (m - 1)) < h
                    vw = _mulmod_lazy(v, vec(inv_ref[st, pi, :]),
                                      vec(inv_sh_ref[st, pi, :]), p)
                    part_m = roll_dyn(vw, jnp.int32(n) - h)
                    part_p = roll_dyn(vw, h)
                    lo_new = _condsub2p(vw + part_m, p)
                    hi_new = _condsub2p(part_p + (p + p) - vw, p)
                    return jnp.where(is_lo, lo_new, hi_new)

                v = jax.lax.fori_loop(jnp.int32(0), jnp.int32(log_n), inv_stage, v)
                res[pi][r] = _mulmod(v, vec(untw_ref[pi, :]),
                                     vec(untw_sh_ref[pi, :]), p)

        # ---- 6. Garner CRT → (hi, lo), signed lift, write -----------------
        for r in range(R):
            t = _garner_digits_horner([res[i][r] for i in range(P)],
                                      primes, g_hinv)
            d_hi, d_lo = _garner_combine_u64(t, prefix, half_digits, m_mod)
            out_lo_ref[:, r, :] = d_lo
            out_hi_ref[:, r, :] = d_hi

    return kernel


def _mulmod_generic(a, b, p_u32, p_int: int):
    """Lazy a*b (mod p) for two dynamic u32 operands (no precomputed Shoup):
    exact double-width product via 16-bit limbs, then congruent-mod-p
    recombination.  Accepts ANY u32 inputs; the result is < 2^32 - p and only
    CONGRUENT to a*b mod p (not fully reduced) — every consumer is a Harvey
    lazy multiply or another generic multiply, both exact for any u32."""
    hi = _mulhi32(a, b)
    lo = a * b
    r32 = (1 << 32) % p_int
    r32_sh = shoup_int(r32, p_int)
    # hi·r32 mod-ish p via one lazy Shoup multiply (result < 2p)
    part = _mulmod_lazy(hi, U32(r32), U32(r32_sh), p_u32)
    # bring lo under ~p by conditional subtractions (lo < 2^32, p ≈ 2^30:
    # 3 subtractions leave lo_red < 2^32 - 3p, a congruent near-p value)
    lo_red = lo
    for _ in range(3):
        lo_red = jnp.where(lo_red >= p_u32, lo_red - p_u32, lo_red)
    # part < 2p, lo_red < 2^32 - 3p  ⇒  sum < 2^32 - p: no u32 overflow
    return part + lo_red


def _reduce_lt_p(a, p_u32, p_int: int):
    """Exact a mod p for any u32 a: one lazy Shoup multiply by w = 1
    (a*1 is free, so 4 hardware multiplies) + final conditional subtract."""
    ws = U32(shoup_int(1, p_int))
    q = _mulhi32_approx(a, ws)
    r = a - q * p_u32                      # < 4p (same bound as _mulmod)
    r = _condsub2p(r, p_u32)
    return jnp.where(r >= p_u32, r - p_u32, r)


# ---------------------------------------------------------------------------
# in-kernel Garner CRT reconstruction (shared by every fused kernel)
# ---------------------------------------------------------------------------


def _garner_consts(primes):
    """Horner-chain constants: inv[i][j] = (p_j^-1 mod p_i, shoup twin)."""
    P = len(primes)
    inv = [[None] * P for _ in range(P)]
    for i in range(1, P):
        for j in range(i):
            v = pow(primes[j] % primes[i], primes[i] - 2, primes[i])
            inv[i][j] = (v, shoup_int(v, primes[i]))
    return inv


def _garner_digits_horner(res, primes, inv):
    """CRT residues → exact mixed-radix digits t_i < p_i.

    Horner form of Garner: t_i = (..((r_i − t_0)·p_0^-1 − t_1)·p_1^-1 ..)
    ·p_{i-1}^-1 (mod p_i) — one modular multiply per (i, j) pair, vs the
    textbook Σ t_j·Π p_k accumulation's two.  Contract: res[0] exact < p_0;
    res[i≥1] may be lazy (< 2 p_i).  All primes ≈ 2^30, so the +2p offset
    keeps every subtraction positive and < 4p (lazy-multiply safe)."""
    t = [res[0]]
    for i in range(1, len(primes)):
        p = U32(primes[i])
        u = res[i]
        for j in range(i):
            diff = u + (p + p) - t[j]      # u < 2p_i, t_j < p_j < 2p_i ⇒ < 4p
            w, ws = inv[i][j]
            mul = _mulmod_lazy if j < i - 1 else _mulmod
            u = mul(diff, U32(w), U32(ws), p)
        t.append(u)
    return t


def _garner_combine_u64(t, prefix, half_digits, m_mod):
    """Mixed-radix digits → ((hi, lo) u32 pair of the signed-lifted value
    mod 2^64).  prefix[i] = Π_{j<i} p_j mod 2^64 as (hi, lo) ints; digit 0's
    weight is 1, so it seeds the accumulator without multiplies."""
    c_lo = t[0]
    c_hi = jnp.zeros_like(t[0])
    for i in range(1, len(t)):
        phi, plo = U32(prefix[i][0]), U32(prefix[i][1])
        lo_t = t[i] * plo
        hi_t = _mulhi32(t[i], plo) + t[i] * phi
        c_lo = c_lo + lo_t
        carry = (c_lo < lo_t).astype(U32)
        c_hi = c_hi + hi_t + carry
    ge = jnp.zeros(t[0].shape, dtype=jnp.bool_)
    eq = jnp.ones(t[0].shape, dtype=jnp.bool_)
    for i in range(len(t) - 1, -1, -1):
        h = U32(half_digits[i])
        ge = ge | (eq & (t[i] > h))
        eq = eq & (t[i] == h)
    m_hi, m_lo = U32(m_mod[0]), U32(m_mod[1])
    borrow = (c_lo < m_lo).astype(U32)
    sel = ge | eq
    d_lo = jnp.where(sel, c_lo - m_lo, c_lo)
    d_hi = jnp.where(sel, c_hi - m_hi - borrow, c_hi)
    return d_hi, d_lo


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def blind_rotate_step_pallas(a_j, acc_hi, acc_lo, bsk_j, bsk_sh_j,
                             decomp: DecompParams, *, n: int, num_primes: int,
                             glwe_size: int, block_b: int = 8,
                             interpret: bool = False, log_q: int = 64,
                             grouping: int = 1):
    """One fused blind-rotation step over the whole batch.

    a_j [B, g] int32, acc_hi/lo [B, R, N] u32,
    bsk_j/bsk_sh_j [2^g, P, J, R, N] u32 → new (acc_hi, acc_lo)."""
    plan = get_plan(n, num_primes)
    primes = [int(p) for p in plan.primes]
    assert all(p < (1 << 30) for p in primes), \
        "kernel's approximate-mulhi Shoup path needs p < 2^30"
    t = build_step_tables(n, num_primes)
    B = acc_hi.shape[0]
    bt = min(block_b, B)
    assert B % bt == 0, f"batch {B} must be a multiple of the tile {bt}"
    R = glwe_size
    kernel = _make_step_kernel(n, num_primes, glwe_size, decomp, primes,
                               log_q, interpret=interpret, grouping=grouping)

    grid = (B // bt,)
    vm = pltpu.VMEM

    # BlockSpecs: batch-tiled operands index by i; broadcast operands pin 0.
    # (index-map constants must be i32 — x64 mode would promote literal 0s
    # to i64, which Mosaic rejects)
    zero = np.int32(0)

    def bcast(shape):
        return pl.BlockSpec(shape, lambda i, _z=zero, _r=len(shape):
                            (_z,) * _r, memory_space=vm)

    in_specs = [
        pl.BlockSpec((bt, grouping), lambda i: (i, zero), memory_space=vm), # a
        pl.BlockSpec((bt, R, n), lambda i: (i, zero, zero), memory_space=vm),  # hi
        pl.BlockSpec((bt, R, n), lambda i: (i, zero, zero), memory_space=vm),  # lo
        bcast(bsk_j.shape),
        bcast(bsk_sh_j.shape),
        bcast(t.twist.shape), bcast(t.twist_sh.shape),
        bcast(t.fwd.shape), bcast(t.fwd_sh.shape),
        bcast(t.inv.shape), bcast(t.inv_sh.shape),
        bcast(t.untwist.shape), bcast(t.untwist_sh.shape),
        bcast(t.mono.shape), bcast(t.mono_sh.shape),
    ]
    out_specs = (
        pl.BlockSpec((bt, R, n), lambda i: (i, zero, zero), memory_space=vm),
        pl.BlockSpec((bt, R, n), lambda i: (i, zero, zero), memory_space=vm),
    )
    out_shape = (jax.ShapeDtypeStruct(acc_hi.shape, jnp.uint32),
                 jax.ShapeDtypeStruct(acc_lo.shape, jnp.uint32))
    a2d = a_j.astype(jnp.int32)
    if a2d.ndim == 1:
        a2d = a2d[:, None]
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
    )(a2d, acc_hi, acc_lo, bsk_j, bsk_sh_j,
      jnp.asarray(t.twist), jnp.asarray(t.twist_sh),
      jnp.asarray(t.fwd), jnp.asarray(t.fwd_sh),
      jnp.asarray(t.inv), jnp.asarray(t.inv_sh),
      jnp.asarray(t.untwist), jnp.asarray(t.untwist_sh),
      jnp.asarray(t.mono), jnp.asarray(t.mono_sh))


# ---------------------------------------------------------------------------
# MXU variant: four-step NTT as int8 limb matmuls (fourstep.py)
# ---------------------------------------------------------------------------


def _i8_limbs(v2d, k_limbs: int, axis: int):
    """u32 [R, C] -> int8 limbs (u_k - 128) stacked along `axis`."""
    parts = [(((v2d >> U32(8 * i)) & U32(255)).astype(I32) - 128
              ).astype(jnp.int8) for i in range(k_limbs)]
    return jnp.concatenate(parts, axis=axis)


def _dot_i8(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _recombine_mxu(s_m, addend_m, d_add, consts, p, fold: bool = True):
    """S'_m = S_m + addend_m nonneg < 2^26; returns u32 congruent to
    sum_m 2^{8m} S'_m + d_add (mod p).  Exact 48-bit assembly split at bit
    24, then lazy Shoup multiplies (fourstep.py docstring).

    fold=True: one extra lazy multiply folds the result under 2p + 2^16.
    fold=False: returns the raw assembly y < 2^32 directly — valid whenever
    the consumer is a Harvey lazy or generic multiply (both exact for any
    u32 operand); bound: low < 1.5*2^26, t < 2p < 2^31, d_add < p < 2^30
    ⇒ y < 0.8 * 2^32."""
    sp = [(s_m[m] + addend_m[m]).astype(U32) for m in range(4)]
    a = sp[1] & U32(0xFFFF)
    b = sp[1] >> U32(16)
    c = sp[2] & U32(0xFF)
    d = sp[2] >> U32(8)
    low = sp[0] + (a << U32(8)) + (c << U32(16))
    high = b + d + sp[3]
    c24, c24s, c16, c16s = consts
    t = _mulmod_lazy(high, U32(c24), U32(c24s), p)
    y = low + t + d_add
    if not fold:
        return y
    return (y & U32(0xFFFF)) + _mulmod_lazy(y >> U32(16), U32(c16), U32(c16s), p)


def _make_step_kernel_mxu(n: int, num_primes: int, glwe_size: int,
                          decomp: DecompParams, primes, log_q: int = 64,
                          grouping: int = 1, mode: str = "delta"):
    """Fused blind-rotation step with the NTTs on the MXU.

    Layout: every length-N array lives as [bt, N1, N2] (N2 = min(N, 128)
    lanes, flat coefficient/spectral index = n1_idx*N2 + n2_idx); matmul
    stages run on 2D views [bt*N1, N2].  See fourstep.py for the math.

    Monomial phases arrive PRE-GATHERED from the full-exponent HBM tables
    (fourstep.monomial_full_tables) — no in-kernel exponentiation ladder —
    with Shoup twins, so every phase multiply is a lazy Shoup multiply.

    mode="delta" (classic): the step is the standard CMUX in delta form,
        acc += iNTT( (X^a - 1)-phase ⊙ (GGSW(s) spectral-MAC acc) ),
    with the (X^a - 1) spectrum gathered per batch element: ph [bt, P, N].
    One GGSW per step (bsk [P, J, R, N]) — half the paired form's traffic,
    J*R fewer lazy multiplies, and no trivial-gadget rounding term.

    mode="multibit": acc = iNTT( Σ_v (X^{c_v}-phase_v ⊙ d̂) MAC GGSW_v ),
    phases for variants v=1..V-1 gathered per step: ph [bt, V-1, P, N]
    (variant 0 has exponent 0, phase 1)."""
    from . import fourstep as fs

    assert mode in ("delta", "multibit")
    G = grouping
    V = 1 << G
    P = num_primes
    R = glwe_size
    L = decomp.level
    J = L * R
    B_log = decomp.base_log
    base = 1 << B_log
    half_base = base >> 1
    shift = log_q - B_log * L
    assert shift >= 32
    assert B_log <= 24, "digit-offset limb split assumes |digit| <= 2^23"
    n1 = fs._split_nm(n)[0]
    n2 = fs._split_nm(n)[1]
    plan = get_plan(n, num_primes)
    g_hinv = _garner_consts(primes)
    prefix = [(int(x) >> 32, int(x) & 0xFFFFFFFF) for x in plan.prefix_mod]
    m_mod = (plan.M_mod >> 32, plan.M_mod & 0xFFFFFFFF)
    half_digits = [int(x) for x in plan.half_digits]
    rc = [fs.recomb_consts(p) for p in primes]
    d_right = [(-fs.BIAS_SUM) % p for p in primes]   # bias-only fold, dense stages

    def kernel(ph_ref, ph_sh_ref, acc_hi_ref, acc_lo_ref, bsk_ref, bsk_sh_ref,
               wfa_ref, ca_ref, da_ref, tf_ref, tf_sh_ref, wfb_ref, cb_ref,
               wia_ref, cia_ref, ti_ref, ti_sh_ref, wib_ref, cib_ref, dib_ref,
               out_hi_ref, out_lo_ref):
        bt = acc_hi_ref.shape[0]
        rows = bt * n1

        # ---- 1. decompose the accumulator from (hi, lo) -------------------
        digits = [[None] * R for _ in range(L)]
        for r in range(R):
            hi = acc_hi_ref[:, r]                      # [bt, N1, N2]
            lo = acc_lo_ref[:, r]
            if shift - 1 >= 32:
                hi_r = hi + U32(1 << (shift - 1 - 32))
            else:
                carry = (lo >= U32(0x80000000)).astype(U32)
                hi_r = hi + carry
            s = hi_r >> U32(shift - 32) if shift > 32 else hi_r
            for li in range(L - 1, -1, -1):
                raw = s & U32(base - 1)
                carry = (raw + U32(half_base)) >> U32(B_log)
                d = raw.astype(I32) - (carry.astype(I32) << B_log)
                s = (s >> U32(B_log)) + carry
                digits[li][r] = d

        # ---- 2. forward four-step NTT per (level, component) ---------------
        d_hat = [[None] * J for _ in range(P)]
        for li in range(L):
            for r in range(R):
                u = (digits[li][r] + I32(fs.DIGIT_OFF)).astype(U32)
                data3 = _i8_limbs(u.reshape(rows, n2), 3, axis=0)
                for pi in range(P):
                    p = U32(primes[pi])
                    s = _dot_i8(wfa_ref[pi], data3)          # [4*rows, N2]
                    s_m = [s[m * rows:(m + 1) * rows].reshape(bt, n1, n2)
                           for m in range(4)]
                    add_m = [ca_ref[pi, m] for m in range(4)]
                    # fold=False: the next op is a lazy multiply (any-u32)
                    x1 = _recombine_mxu(s_m, add_m, da_ref[pi], rc[pi], p,
                                        fold=False)
                    x1 = _mulmod_lazy(x1, tf_ref[pi], tf_sh_ref[pi], p)
                    data4 = _i8_limbs(x1.reshape(rows, n2), 4, axis=1)
                    s2 = _dot_i8(data4, wfb_ref[pi])         # [rows, 4*N2]
                    s2_m = [s2[:, m * n2:(m + 1) * n2] for m in range(4)]
                    add2 = [cb_ref[pi, m] for m in range(4)]
                    # fold=False: consumed by the MAC's lazy/generic multiplies
                    xh = _recombine_mxu(s2_m, add2, U32(d_right[pi]), rc[pi],
                                        p, fold=False)
                    d_hat[pi][li * R + r] = xh.reshape(bt, n1, n2)

        # ---- 3+4. MAC with pre-gathered monomial phases ---------------------
        # _mulmod_lazy is exact for ANY u32 left operand (r = a*w - q*p stays
        # < 4p for a < 2^32), so the fold=False fwd-NTT outputs feed straight
        # into phase/BSK lazy multiplies.
        spec = [[None] * R for _ in range(P)]
        if mode == "delta":
            for pi in range(P):
                p = U32(primes[pi])
                for r in range(R):
                    acc_s = None
                    for j in range(J):
                        t0 = _mulmod_lazy(d_hat[pi][j], bsk_ref[pi, j, r],
                                          bsk_sh_ref[pi, j, r], p)
                        acc_s = t0 if acc_s is None else _condsub2p(acc_s + t0, p)
                    # (X^a - 1) phase on the product spectrum: one lazy mul
                    spec[pi][r] = _mulmod_lazy(acc_s, ph_ref[:, pi],
                                               ph_sh_ref[:, pi], p)
        else:
            for pi in range(P):
                p = U32(primes[pi])
                for v in range(V):
                    d_use = (d_hat[pi] if v == 0 else
                             [_mulmod_lazy(d_hat[pi][j], ph_ref[:, v - 1, pi],
                                           ph_sh_ref[:, v - 1, pi], p)
                              for j in range(J)])
                    for r in range(R):
                        acc_s = spec[pi][r]
                        for j in range(J):
                            t0 = _mulmod_lazy(d_use[j], bsk_ref[v, pi, j, r],
                                              bsk_sh_ref[v, pi, j, r], p)
                            acc_s = (t0 if acc_s is None else
                                     _condsub2p(acc_s + t0, p))
                        spec[pi][r] = acc_s

        # ---- 5. inverse four-step NTT ---------------------------------------
        res = [[None] * R for _ in range(P)]
        for pi in range(P):
            p = U32(primes[pi])
            for r in range(R):
                v2 = spec[pi][r]                              # [bt,N1,N2] < 2p
                data4 = _i8_limbs(v2.reshape(rows, n2), 4, axis=1)
                s = _dot_i8(data4, wia_ref[pi])
                s_m = [s[:, m * n2:(m + 1) * n2] for m in range(4)]
                add_m = [cia_ref[pi, m] for m in range(4)]
                # fold=False: the next op is a lazy multiply (any-u32)
                d = _recombine_mxu(s_m, add_m, U32(d_right[pi]), rc[pi], p,
                                   fold=False)
                d = _mulmod_lazy(d.reshape(bt, n1, n2), ti_ref[pi],
                                 ti_sh_ref[pi], p)
                data4b = _i8_limbs(d.reshape(rows, n2), 4, axis=0)
                s2 = _dot_i8(wib_ref[pi], data4b)            # [4*rows, N2]
                s2_m = [s2[m * rows:(m + 1) * rows].reshape(bt, n1, n2)
                        for m in range(4)]
                add2 = [cib_ref[pi, m] for m in range(4)]
                # fold=False output < 3p + 2^26: one condsub makes it a
                # lazy (< 2p) residue, which the Horner Garner chain accepts
                # for i >= 1; only prime 0's digit needs the exact reduction
                x = _recombine_mxu(s2_m, add2, dib_ref[pi], rc[pi], p,
                                   fold=False)
                x = _condsub2p(x, p)
                res[pi][r] = _reduce_lt_p(x, p, primes[0]) if pi == 0 else x

        # ---- 6. Garner CRT -> (hi, lo), signed lift, write -----------------
        for r in range(R):
            t = _garner_digits_horner([res[i][r] for i in range(P)],
                                      primes, g_hinv)
            d_hi, d_lo = _garner_combine_u64(t, prefix, half_digits, m_mod)
            if mode == "delta":
                # acc += delta (two-limb wraparound add mod 2^64)
                s_lo = acc_lo_ref[:, r] + d_lo
                carry = (s_lo < d_lo).astype(U32)
                out_lo_ref[:, r] = s_lo
                out_hi_ref[:, r] = acc_hi_ref[:, r] + d_hi + carry
            else:
                out_lo_ref[:, r] = d_lo
                out_hi_ref[:, r] = d_hi

    return kernel


def _make_step_kernel_mxu_lanes(n: int, num_primes: int, glwe_size: int,
                                decomp: DecompParams, primes, log_q: int = 64,
                                grouping: int = 1, mode: str = "delta"):
    """Fused MXU blind-rotation step in the "lanes" layout.

    Polynomials live as [N1, bt*N2] — the batch tile folded into the LANE
    dimension (lane = b*N2 + j2) — so the N1-contraction matmul stages are
    DENSE [*, 3|4*N1] dots shared by the whole tile instead of bt-times
    redundant block-diagonal ones, and forward stage A stacks prime pairs
    along the output rows (the digit-limb input is prime-independent) to
    fill the MXU's 128-row tile.  The N2-contraction stages run in the
    rows-(k1, b) layout [N1*bt, N2]; the two layouts exchange with one
    jnp.reshape per (transform, prime) — a sublane<->lane-chunk relayout of
    ~16 vregs, far cheaper than the block-diagonal MXU waste it removes.

    Same delta/multibit semantics as _make_step_kernel_mxu; phases arrive
    gathered from the [P, N1, 2n, N2]-layout tables so their blocks are
    already [P, N1, bt, N2] — no transposes anywhere."""
    from . import fourstep as fs

    assert mode in ("delta", "multibit")
    G = grouping
    V = 1 << G
    P = num_primes
    R = glwe_size
    L = decomp.level
    J = L * R
    B_log = decomp.base_log
    base = 1 << B_log
    half_base = base >> 1
    shift = log_q - B_log * L
    assert shift >= 32
    assert B_log <= 24
    n1, n2 = fs._split_nm(n)
    plan = get_plan(n, num_primes)
    g_hinv = _garner_consts(primes)
    prefix = [(int(x) >> 32, int(x) & 0xFFFFFFFF) for x in plan.prefix_mod]
    m_mod = (plan.M_mod >> 32, plan.M_mod & 0xFFFFFFFF)
    half_digits = [int(x) for x in plan.half_digits]
    rc = [fs.recomb_consts(p) for p in primes]
    d_right = [(-fs.BIAS_SUM) % p for p in primes]
    pairs = fs.get_kernel_tables_lanes(n, num_primes, 1).pairs

    def kernel(ph_ref, ph_sh_ref, acc_hi_ref, acc_lo_ref, bsk_ref, bsk_sh_ref,
               wfa_ref, ca_ref, da_ref, tf_ref, tf_sh_ref, wfb_ref, cb_ref,
               wia_ref, cia_ref, ti_ref, ti_sh_ref, wib_ref, cib_ref, dib_ref,
               out_hi_ref, out_lo_ref):
        btn2 = acc_hi_ref.shape[-1]
        bt = btn2 // n2

        # ---- 1. decompose ([N1, bt*N2] planes) -----------------------------
        digits = [[None] * R for _ in range(L)]
        for r in range(R):
            hi = acc_hi_ref[r]
            lo = acc_lo_ref[r]
            if shift - 1 >= 32:
                hi_r = hi + U32(1 << (shift - 1 - 32))
            else:
                carry = (lo >= U32(0x80000000)).astype(U32)
                hi_r = hi + carry
            s = hi_r >> U32(shift - 32) if shift > 32 else hi_r
            for li in range(L - 1, -1, -1):
                raw = s & U32(base - 1)
                carry = (raw + U32(half_base)) >> U32(B_log)
                d = raw.astype(I32) - (carry.astype(I32) << B_log)
                s = (s >> U32(B_log)) + carry
                digits[li][r] = d

        # ---- 2. forward NTT: dense prime-paired stage A, then stage B ------
        d_hat = [[None] * J for _ in range(P)]    # [N1*bt, N2] rows (k1, b)
        for li in range(L):
            for r in range(R):
                u = (digits[li][r] + I32(fs.DIGIT_OFF)).astype(U32)
                data3 = _i8_limbs(u, 3, axis=0)          # [3*N1, bt*N2]
                for pp, pair in enumerate(pairs):
                    s = _dot_i8(wfa_ref[pp], data3)      # [ps*4*N1, bt*N2]
                    for which, pi in enumerate(pair):
                        p = U32(primes[pi])
                        b0 = which * 4 * n1
                        s_m = [s[b0 + m * n1:b0 + (m + 1) * n1]
                               for m in range(4)]
                        add_m = [ca_ref[pp, which, m] for m in range(4)]
                        x1 = _recombine_mxu(s_m, add_m, da_ref[pi], rc[pi],
                                            p, fold=False)
                        x1 = _mulmod_lazy(x1, tf_ref[pi], tf_sh_ref[pi], p)
                        xr = x1.reshape(n1 * bt, n2)     # lanes -> rows
                        data4 = _i8_limbs(xr, 4, axis=1)
                        s2 = _dot_i8(data4, wfb_ref[pi])
                        s2_m = [s2[:, m * n2:(m + 1) * n2] for m in range(4)]
                        add2 = [cb_ref[pi, m] for m in range(4)]
                        xh = _recombine_mxu(s2_m, add2, U32(d_right[pi]),
                                            rc[pi], p, fold=False)
                        d_hat[pi][li * R + r] = xh

        # ---- 3+4. MAC with pre-gathered phases (rows-(k1, b) 3D views) -----
        spec = [[None] * R for _ in range(P)]
        if mode == "delta":
            for pi in range(P):
                p = U32(primes[pi])
                ph3 = ph_ref[pi]                          # [N1, bt, N2]
                ph3_sh = ph_sh_ref[pi]
                for r in range(R):
                    acc_s = None
                    for j in range(J):
                        d3 = d_hat[pi][j].reshape(n1, bt, n2)
                        w3 = bsk_ref[pi, j, r].reshape(n1, 1, n2)
                        w3s = bsk_sh_ref[pi, j, r].reshape(n1, 1, n2)
                        t0 = _mulmod_lazy(d3, w3, w3s, p)
                        acc_s = t0 if acc_s is None else _condsub2p(acc_s + t0, p)
                    spec[pi][r] = _mulmod_lazy(acc_s, ph3, ph3_sh, p)
        else:
            for pi in range(P):
                p = U32(primes[pi])
                d3s = [d_hat[pi][j].reshape(n1, bt, n2) for j in range(J)]
                for v in range(V):
                    if v == 0:
                        d_use = d3s
                    else:
                        phv = ph_ref[pi, :, :, v - 1]     # [N1, bt, N2]
                        phv_sh = ph_sh_ref[pi, :, :, v - 1]
                        d_use = [_mulmod_lazy(d3s[j], phv, phv_sh, p)
                                 for j in range(J)]
                    for r in range(R):
                        acc_s = spec[pi][r]
                        for j in range(J):
                            w3 = bsk_ref[v, pi, j, r].reshape(n1, 1, n2)
                            w3s = bsk_sh_ref[v, pi, j, r].reshape(n1, 1, n2)
                            t0 = _mulmod_lazy(d_use[j], w3, w3s, p)
                            acc_s = (t0 if acc_s is None else
                                     _condsub2p(acc_s + t0, p))
                        spec[pi][r] = acc_s

        # ---- 5. inverse NTT: dense stage B back in lanes layout -------------
        res = [[None] * R for _ in range(P)]
        for pi in range(P):
            p = U32(primes[pi])
            for r in range(R):
                v2 = spec[pi][r].reshape(n1 * bt, n2)
                data4 = _i8_limbs(v2, 4, axis=1)
                s = _dot_i8(data4, wia_ref[pi])
                s_m = [s[:, m * n2:(m + 1) * n2] for m in range(4)]
                add_m = [cia_ref[pi, m] for m in range(4)]
                d = _recombine_mxu(s_m, add_m, U32(d_right[pi]), rc[pi], p,
                                   fold=False)
                d3 = _mulmod_lazy(d.reshape(n1, bt, n2),
                                  ti_ref[pi].reshape(n1, 1, n2),
                                  ti_sh_ref[pi].reshape(n1, 1, n2), p)
                dr = d3.reshape(n1, bt * n2)              # rows -> lanes
                data4b = _i8_limbs(dr, 4, axis=0)         # [4*N1, bt*N2]
                s2 = _dot_i8(wib_ref[pi], data4b)
                s2_m = [s2[m * n1:(m + 1) * n1] for m in range(4)]
                add2 = [cib_ref[pi, m] for m in range(4)]
                # fold=False output < 3p + 2^26: one condsub makes it a
                # lazy (< 2p) residue, which the Horner Garner chain accepts
                # for i >= 1; only prime 0's digit needs the exact reduction
                x = _recombine_mxu(s2_m, add2, dib_ref[pi], rc[pi], p,
                                   fold=False)
                x = _condsub2p(x, p)
                res[pi][r] = _reduce_lt_p(x, p, primes[0]) if pi == 0 else x

        # ---- 6. Garner CRT -> (hi, lo), signed lift, write ------------------
        for r in range(R):
            t = _garner_digits_horner([res[i][r] for i in range(P)],
                                      primes, g_hinv)
            d_hi, d_lo = _garner_combine_u64(t, prefix, half_digits, m_mod)
            if mode == "delta":
                s_lo = acc_lo_ref[r] + d_lo
                carry = (s_lo < d_lo).astype(U32)
                out_lo_ref[r] = s_lo
                out_hi_ref[r] = acc_hi_ref[r] + d_hi + carry
            else:
                out_lo_ref[r] = d_lo
                out_hi_ref[r] = d_hi

    return kernel


def blind_rotate_step_pallas_mxu_lanes(ph, ph_sh, acc_hi, acc_lo, bsk_j,
                                       bsk_sh_j, decomp: DecompParams, *,
                                       n: int, num_primes: int,
                                       glwe_size: int, block_b: int = 8,
                                       interpret: bool = False,
                                       log_q: int = 64, grouping: int = 1,
                                       mode: str = "delta"):
    """One fused MXU blind-rotation step in the "lanes" layout.

    acc_hi/lo [R, N1, B*N2] u32 (batch folded into lanes); phases gathered
    from the [P, N1, 2n, N2]-layout tables:
      mode="delta":    ph [P, N1, B, N2],  bsk_j [P, J, R, N1, N2];
      mode="multibit": ph [P, N1, B, 2^g - 1, N2],
                       bsk_j [2^g, P, J, R, N1, N2]."""
    from . import fourstep as fs

    plan = get_plan(n, num_primes)
    primes = [int(p) for p in plan.primes]
    assert all(p < (1 << 30) for p in primes)
    n1, n2 = fs._split_nm(n)
    B = acc_hi.shape[-1] // n2
    bt = min(block_b, B)
    assert B % bt == 0
    kt = fs.get_kernel_tables_lanes(n, num_primes, bt)
    kernel = _make_step_kernel_mxu_lanes(n, num_primes, glwe_size, decomp,
                                         primes, log_q, grouping=grouping,
                                         mode=mode)

    grid = (B // bt,)
    vm = pltpu.VMEM
    zero = np.int32(0)

    def bcast(shape):
        return pl.BlockSpec(shape, lambda i, _z=zero, _r=len(shape):
                            (_z,) * _r, memory_space=vm)

    R = glwe_size
    acc_spec = pl.BlockSpec((R, n1, bt * n2), lambda i: (zero, zero, i),
                            memory_space=vm)
    if mode == "delta":
        ph_spec = pl.BlockSpec((num_primes, n1, bt, n2),
                               lambda i: (zero, zero, i, zero),
                               memory_space=vm)
    else:
        ph_spec = pl.BlockSpec((num_primes, n1, bt, ph.shape[-2], n2),
                               lambda i: (zero, zero, i, zero, zero),
                               memory_space=vm)

    tables = (kt.wfa, kt.ca, kt.da, kt.tf_t, kt.tf_sh_t, kt.wfb, kt.cb,
              kt.wia, kt.cia, kt.ti, kt.ti_sh, kt.wib, kt.cib, kt.dib)
    in_specs = ([ph_spec, ph_spec, acc_spec, acc_spec,
                 bcast(bsk_j.shape), bcast(bsk_sh_j.shape)]
                + [bcast(t.shape) for t in tables])
    out_specs = (acc_spec, acc_spec)
    out_shape = (jax.ShapeDtypeStruct(acc_hi.shape, jnp.uint32),
                 jax.ShapeDtypeStruct(acc_lo.shape, jnp.uint32))
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
    )(ph, ph_sh, acc_hi, acc_lo, bsk_j, bsk_sh_j,
      *(jnp.asarray(t) for t in tables))


def blind_rotate_step_pallas_mxu(ph, ph_sh, acc_hi, acc_lo, bsk_j, bsk_sh_j,
                                 decomp: DecompParams, *, n: int,
                                 num_primes: int, glwe_size: int,
                                 block_b: int = 8, interpret: bool = False,
                                 log_q: int = 64, grouping: int = 1,
                                 mode: str = "delta"):
    """One fused MXU blind-rotation step over the whole batch.

    acc_hi/lo [B, R, N1, N2] u32; phases pre-gathered from the full-exponent
    tables (fourstep.monomial_full_tables), FOUR-STEP spectral order:
      mode="delta":    ph [B, P, N1, N2] = (X^a - 1) spectra,
                       bsk_j [P, J, R, N1, N2] (one GGSW);
      mode="multibit": ph [B, 2^g - 1, P, N1, N2] = X^{c_v} spectra,
                       bsk_j [2^g, P, J, R, N1, N2]."""
    from . import fourstep as fs

    plan = get_plan(n, num_primes)
    primes = [int(p) for p in plan.primes]
    assert all(p < (1 << 30) for p in primes)
    B = acc_hi.shape[0]
    bt = min(block_b, B)
    assert B % bt == 0
    kt = fs.get_kernel_tables(n, num_primes, bt)
    kernel = _make_step_kernel_mxu(n, num_primes, glwe_size, decomp, primes,
                                   log_q, grouping=grouping, mode=mode)

    grid = (B // bt,)
    vm = pltpu.VMEM
    zero = np.int32(0)

    def bcast(shape):
        return pl.BlockSpec(shape, lambda i, _z=zero, _r=len(shape):
                            (_z,) * _r, memory_space=vm)

    def tiled(shape):
        return pl.BlockSpec((bt,) + shape[1:],
                            lambda i, _z=zero, _r=len(shape) - 1:
                            (i,) + (_z,) * _r, memory_space=vm)

    tables = (kt.wfa, kt.ca, kt.da, kt.tf, kt.tf_sh, kt.wfb, kt.cb,
              kt.wia, kt.cia, kt.ti, kt.ti_sh, kt.wib, kt.cib, kt.dib)
    in_specs = ([tiled(ph.shape), tiled(ph_sh.shape),
                 tiled(acc_hi.shape), tiled(acc_lo.shape),
                 bcast(bsk_j.shape), bcast(bsk_sh_j.shape)]
                + [bcast(t.shape) for t in tables])
    out_specs = (tiled(acc_hi.shape), tiled(acc_lo.shape))
    out_shape = (jax.ShapeDtypeStruct(acc_hi.shape, jnp.uint32),
                 jax.ShapeDtypeStruct(acc_lo.shape, jnp.uint32))
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
    )(ph, ph_sh, acc_hi, acc_lo, bsk_j, bsk_sh_j,
      *(jnp.asarray(t) for t in tables))


def _make_rotation_kernel_mxu(n: int, num_primes: int, glwe_size: int,
                              decomp: DecompParams, primes, log_q: int = 64,
                              grouping: int = 1, mode: str = "delta",
                              bt: int = 8, interpret: bool = False,
                              ablate: frozenset = frozenset(), spc: int = 1,
                              loop_steps: int = 0, sub_bt: int = 0,
                              mono_log_s: int = 0):
    """WHOLE blind rotation as one kernel: grid (batch tiles, steps).

    Per batch tile the accumulator lives in the OUTPUT block, which stays
    resident in VMEM across all step iterations (its block index ignores the
    step grid dim) — no per-step HBM round trip.  The BSK step slice is a
    pipelined input block indexed by the step (double-buffered by Pallas
    straight from HBM, overlapped with compute).  Monomial phase rows are
    DMA'd in-kernel from the full-exponent HBM table by mod-switched
    exponents read from an SMEM block — the copies are issued before the
    forward NTT and waited just before the MAC, so the gather is free.

    Same delta/multibit step semantics as _make_step_kernel_mxu.

    `ablate` (profiling only — results become WRONG): a set of stage names
    {"decomp","fwd","phase","mac","inv","garner"} each replaced by a cheap
    passthrough, so timing deltas against the full kernel give the true
    per-stage cost on hardware (tools/ablate_kernel.py).

    `spc` (steps per cell): unrolls that many consecutive blind-rotation
    steps into one grid cell — the per-cell Mosaic iteration overhead
    (measured ~2.4 µs across 21 operands) is paid once per `spc` steps.  The
    BSK input block grows to `spc` step slices (still pipelined from HBM)
    and the phase scratch gains a leading `spc` axis."""
    from . import fourstep as fs

    assert mode in ("delta", "multibit")
    G = grouping
    V = 1 << G
    P = num_primes
    R = glwe_size
    L = decomp.level
    J = L * R
    B_log = decomp.base_log
    base = 1 << B_log
    half_base = base >> 1
    shift = log_q - B_log * L
    assert shift >= 32
    assert B_log <= 24
    n1, n2 = fs._split_nm(n)
    plan = get_plan(n, num_primes)
    g_hinv = _garner_consts(primes)
    prefix = [(int(x) >> 32, int(x) & 0xFFFFFFFF) for x in plan.prefix_mod]
    m_mod = (plan.M_mod >> 32, plan.M_mod & 0xFFFFFFFF)
    half_digits = [int(x) for x in plan.half_digits]
    rc = [fs.recomb_consts(p) for p in primes]
    d_right = [(-fs.BIAS_SUM) % p for p in primes]
    NV = 1 if mode == "delta" else V - 1   # phase rows per batch element
    # sub_bt > 0: the two block-diagonal matmul stages (fwd A, inv B) run as
    # bt/sub_bt DENSE dots over sub_bt-element batch groups instead of one
    # bt-blockdiagonal dot — the blockdiagonal embedding wastes bt x the
    # MACs; sub_bt=2 keeps the contraction dim at/under the 128 MXU tile
    # (fwd A: 96, inv B: 128 at N1=16) so the dense dots pad minimally
    if sub_bt and (bt % sub_bt or sub_bt >= bt):
        sub_bt = 0
    nsub = bt // sub_bt if sub_bt else 0
    # mono_log_s > 0: the phase table is the FACTORED stack (fourstep.
    # monomial_split_tables) — rows [0, S) hold X^{e_lo}, rows [S, ...)
    # hold X^{S e_hi}.  The kernel DMAs both halves' rows and applies the
    # phase as two lazy Shoup multiplies; delta mode's (X^e - 1) factor
    # becomes an explicit subtract of the unphased spectrum.
    factored = mono_log_s > 0
    S_lo = 1 << mono_log_s

    def kernel(idx_ref, acc_hi_in, acc_lo_in, bsk_ref, bsk_sh_ref,
               tab_ref, tab_sh_ref,
               wfa_ref, ca_ref, da_ref, tf_ref, tf_sh_ref, wfb_ref, cb_ref,
               wia_ref, cia_ref, ti_ref, ti_sh_ref, wib_ref, cib_ref, dib_ref,
               out_hi_ref, out_lo_ref, ph_vmem, ph_sh_vmem, sem):
        j_cell = pl.program_id(1)
        rows = bt * n1

        # ---- 0. start ALL substeps' phase-row DMAs (HBM table -> VMEM) -----
        # issued before any compute so the gathers hide behind the NTTs
        copies = [[] for _ in range(spc)]
        for sub in range(spc if "phase" not in ablate else 0):
            # keep index arithmetic i32 (x64 mode promotes python ints)
            j_step = j_cell * np.int32(spc) + np.int32(sub)
            for b in range(bt):
                for v in range(NV):
                    # idx block rows = batch tile (x NV), cols = ALL steps
                    # (Mosaic requires the last block dim equal the array's)
                    e = (idx_ref[b, j_step] if NV == 1 else
                         idx_ref[b * NV + v, j_step])
                    # static slice indices must be i32 (x64 mode promotes
                    # Python ints to i64, which tpu.memref_slice rejects)
                    s32, b32, v32 = np.int32(sub), np.int32(b), np.int32(v)
                    if factored:
                        row_specs = ((0, e & np.int32(S_lo - 1)),
                                     (1, (e >> np.int32(mono_log_s))
                                      + np.int32(S_lo)))
                    else:
                        row_specs = ((None, e),)
                    for half, ee in row_specs:
                        if half is None:
                            dst = (ph_vmem.at[s32, b32] if NV == 1 else
                                   ph_vmem.at[s32, b32, v32])
                            dsh = (ph_sh_vmem.at[s32, b32] if NV == 1 else
                                   ph_sh_vmem.at[s32, b32, v32])
                        else:
                            h32 = np.int32(half)
                            dst = (ph_vmem.at[s32, b32, h32] if NV == 1 else
                                   ph_vmem.at[s32, b32, v32, h32])
                            dsh = (ph_sh_vmem.at[s32, b32, h32] if NV == 1
                                   else ph_sh_vmem.at[s32, b32, v32, h32])
                        c1 = pltpu.make_async_copy(tab_ref.at[ee], dst, sem)
                        c2 = pltpu.make_async_copy(tab_sh_ref.at[ee], dsh, sem)
                        c1.start()
                        c2.start()
                        copies[sub] += [c1, c2]

        # ---- 0b. first cell: seed the resident accumulator -----------------
        @pl.when(j_cell == 0)
        def _init():
            out_hi_ref[...] = acc_hi_in[...]
            out_lo_ref[...] = acc_lo_in[...]

        for sub in range(spc):
            _do_step(sub, copies[sub], bsk_ref, bsk_sh_ref,
                     wfa_ref, ca_ref, da_ref, tf_ref, tf_sh_ref, wfb_ref,
                     cb_ref, wia_ref, cia_ref, ti_ref, ti_sh_ref, wib_ref,
                     cib_ref, dib_ref, out_hi_ref, out_lo_ref,
                     ph_vmem, ph_sh_vmem, rows)

    def _do_step(sub, step_copies, bsk_ref, bsk_sh_ref,
                 wfa_ref, ca_ref, da_ref, tf_ref, tf_sh_ref, wfb_ref, cb_ref,
                 wia_ref, cia_ref, ti_ref, ti_sh_ref, wib_ref, cib_ref,
                 dib_ref, out_hi_ref, out_lo_ref, ph_vmem, ph_sh_vmem, rows):
        # ---- 1. decompose the resident accumulator -------------------------
        digits = [[None] * R for _ in range(L)]
        for r in range(R):
            if "decomp" in ablate:
                for li in range(L):
                    digits[li][r] = (out_hi_ref[:, r] & U32(base - 1)).astype(I32)
                continue
            hi = out_hi_ref[:, r]
            lo = out_lo_ref[:, r]
            if shift - 1 >= 32:
                hi_r = hi + U32(1 << (shift - 1 - 32))
            else:
                carry = (lo >= U32(0x80000000)).astype(U32)
                hi_r = hi + carry
            s = hi_r >> U32(shift - 32) if shift > 32 else hi_r
            for li in range(L - 1, -1, -1):
                raw = s & U32(base - 1)
                carry = (raw + U32(half_base)) >> U32(B_log)
                d = raw.astype(I32) - (carry.astype(I32) << B_log)
                s = (s >> U32(B_log)) + carry
                digits[li][r] = d

        # ---- 2. forward four-step NTT ---------------------------------------
        # All J transforms ride the LANE axis (lane block j = transform j)
        # and all P primes stack along stage A's output rows, so the whole
        # step's stage A is ONE int8 dot and every element-wise pass (limb
        # extraction, recombination, twiddle) runs once on a J-wide array.
        # Only aligned lane/sublane slices are used — no relayouts.
        d_hat = [[None] * J for _ in range(P)]
        us = [(digits[li][r] + I32(fs.DIGIT_OFF)).astype(U32)
              for li in range(L) for r in range(R)]
        if "fwd" in ablate:
            for pi in range(P):
                d_hat[pi] = list(us)
        else:
            u_all = jnp.concatenate(us, axis=2)           # [bt, n1, J*n2]
            if sub_bt:
                # dense per-group dots: wfa is the sub_bt-blockdiag stack
                srows = sub_bt * n1
                wfa_flat = wfa_ref[...].reshape(P * 4 * srows, 3 * srows)
                s_grp = []
                for g in range(nsub):
                    u_g = u_all[g * sub_bt:(g + 1) * sub_bt]
                    data3g = _i8_limbs(u_g.reshape(srows, J * n2), 3, axis=0)
                    s_grp.append(_dot_i8(wfa_flat, data3g))
            else:
                data3 = _i8_limbs(u_all.reshape(rows, J * n2), 3, axis=0)
                wfa_flat = wfa_ref[...].reshape(P * 4 * rows, 3 * rows)
                s_all = _dot_i8(wfa_flat, data3)          # [P*4*rows, J*n2]
            for pi in range(P):
                p = U32(primes[pi])
                if sub_bt:
                    srows = sub_bt * n1
                    s_m = [jnp.concatenate(
                        [s_grp[g][pi * 4 * srows + m * srows:
                                  pi * 4 * srows + (m + 1) * srows]
                         for g in range(nsub)], axis=0
                        ).reshape(bt, n1, J * n2) for m in range(4)]
                else:
                    b0 = pi * 4 * rows
                    s_m = [s_all[b0 + m * rows:b0 + (m + 1) * rows
                                 ].reshape(bt, n1, J * n2) for m in range(4)]
                add_m = [ca_ref[pi, m] for m in range(4)]
                x1 = _recombine_mxu(s_m, add_m, da_ref[pi], rc[pi], p,
                                    fold=False)
                # tf_ref is the J-lane-tiled twiddle [P, n1, J*n2]
                x1 = _mulmod_lazy(x1, tf_ref[pi], tf_sh_ref[pi], p)
                x1f = x1.reshape(rows, J * n2)
                l4 = _i8_limbs(x1f, 4, axis=1)            # [rows, 4*(J*n2)]
                data4 = jnp.concatenate([                 # [J*rows, 4*n2]
                    jnp.concatenate(
                        [l4[:, (m * J + j) * n2:(m * J + j + 1) * n2]
                         for m in range(4)], axis=1)
                    for j in range(J)], axis=0)
                s2 = _dot_i8(data4, wfb_ref[pi])          # [J*rows, 4*n2]
                s2_m = [s2[:, m * n2:(m + 1) * n2] for m in range(4)]
                add2 = [cb_ref[pi, m] for m in range(4)]
                xh = _recombine_mxu(s2_m, add2, U32(d_right[pi]), rc[pi],
                                    p, fold=False)        # [J*rows, n2]
                for j in range(J):
                    d_hat[pi][j] = xh[j * rows:(j + 1) * rows
                                      ].reshape(bt, n1, n2)

        # ---- 3. this substep's phases have landed ---------------------------
        for c in step_copies:
            c.wait()

        # ---- 4. MAC ----------------------------------------------------------
        sub32 = np.int32(sub)
        spec = [[None] * R for _ in range(P)]
        if "mac" in ablate:
            for pi in range(P):
                for r in range(R):
                    spec[pi][r] = d_hat[pi][r % J]
        elif mode == "delta":
            for pi in range(P):
                p = U32(primes[pi])
                if factored:
                    lo = ph_vmem[sub32, :, 0, pi]
                    lo_sh = ph_sh_vmem[sub32, :, 0, pi]
                    hi = ph_vmem[sub32, :, 1, pi]
                    hi_sh = ph_sh_vmem[sub32, :, 1, pi]
                else:
                    ph3 = ph_vmem[sub32, :, pi]
                    ph3_sh = ph_sh_vmem[sub32, :, pi]
                for r in range(R):
                    acc_s = None
                    for j in range(J):
                        t0 = _mulmod_lazy(d_hat[pi][j], bsk_ref[sub32, pi, j, r],
                                          bsk_sh_ref[sub32, pi, j, r], p)
                        acc_s = t0 if acc_s is None else _condsub2p(acc_s + t0, p)
                    if "phase" in ablate:
                        spec[pi][r] = acc_s
                    elif factored:
                        # (X^e - 1)·acc = acc·X^{e_lo}·X^{S e_hi} - acc:
                        # two lazy Shoup multiplies then a lazy subtract
                        # (all operands < 2p, result < 2p after one condsub)
                        t = _mulmod_lazy(_mulmod_lazy(acc_s, lo, lo_sh, p),
                                         hi, hi_sh, p)
                        spec[pi][r] = _condsub2p(t + (p + p - acc_s), p)
                    else:
                        spec[pi][r] = _mulmod_lazy(acc_s, ph3, ph3_sh, p)
        else:
            for pi in range(P):
                p = U32(primes[pi])
                for v in range(V):
                    if v == 0 or "phase" in ablate:
                        d_use = d_hat[pi]
                    elif factored:
                        d_use = [_mulmod_lazy(_mulmod_lazy(
                            d_hat[pi][j],
                            ph_vmem[sub32, :, v - 1, 0, pi],
                            ph_sh_vmem[sub32, :, v - 1, 0, pi], p),
                            ph_vmem[sub32, :, v - 1, 1, pi],
                            ph_sh_vmem[sub32, :, v - 1, 1, pi], p)
                            for j in range(J)]
                    else:
                        d_use = [_mulmod_lazy(d_hat[pi][j],
                                              ph_vmem[sub32, :, v - 1, pi],
                                              ph_sh_vmem[sub32, :, v - 1, pi], p)
                                 for j in range(J)]
                    for r in range(R):
                        acc_s = spec[pi][r]
                        for j in range(J):
                            t0 = _mulmod_lazy(d_use[j],
                                              bsk_ref[sub32, v, pi, j, r],
                                              bsk_sh_ref[sub32, v, pi, j, r], p)
                            acc_s = (t0 if acc_s is None else
                                     _condsub2p(acc_s + t0, p))
                        spec[pi][r] = acc_s

        # ---- 5. inverse four-step NTT ----------------------------------------
        # Stage A rides the ROW axis (row block r = GLWE component), stage B
        # the LANE axis, so each stage is one dot per prime and the
        # element-wise passes run once on R-wide arrays.
        res = [[None] * R for _ in range(P)]
        for pi in range(P):
            p = U32(primes[pi])
            if "inv" in ablate:
                for r in range(R):
                    x = _condsub2p(_condsub2p(spec[pi][r], p + p), p)
                    res[pi][r] = jnp.where(x >= p, x - p, x)
                continue
            v_all = jnp.concatenate(
                [spec[pi][r].reshape(rows, n2) for r in range(R)], axis=0)
            data4 = _i8_limbs(v_all, 4, axis=1)           # [R*rows, 4*n2]
            s = _dot_i8(data4, wia_ref[pi])
            s_m = [s[:, m * n2:(m + 1) * n2] for m in range(4)]
            add_m = [cia_ref[pi, m] for m in range(4)]
            d = _recombine_mxu(s_m, add_m, U32(d_right[pi]), rc[pi], p,
                               fold=False)                # [R*rows, n2]
            d = _mulmod_lazy(d.reshape(R * bt, n1, n2), ti_ref[pi],
                             ti_sh_ref[pi], p)
            # stage B: limbs along rows per component, components along lanes
            l4 = [(((d >> U32(8 * k)) & U32(255)).astype(I32) - 128
                   ).astype(jnp.int8) for k in range(4)]  # [R*bt, n1, n2] x4
            if sub_bt:
                srows = sub_bt * n1
                s2_grp = []
                for g in range(nsub):
                    data4b_g = jnp.concatenate([          # [4*srows, R*n2]
                        jnp.concatenate(
                            [l4[k][r * bt + g * sub_bt:
                                   r * bt + (g + 1) * sub_bt
                                   ].reshape(srows, n2) for r in range(R)],
                            axis=1)
                        for k in range(4)], axis=0)
                    s2_grp.append(_dot_i8(wib_ref[pi], data4b_g))
                s2_m = [jnp.concatenate(
                    [s2_grp[g][m * srows:(m + 1) * srows]
                     for g in range(nsub)], axis=0
                    ).reshape(bt, n1, R * n2) for m in range(4)]
            else:
                data4b = jnp.concatenate([                # [4*rows, R*n2]
                    jnp.concatenate(
                        [l4[k][r * bt:(r + 1) * bt].reshape(rows, n2)
                         for r in range(R)], axis=1)
                    for k in range(4)], axis=0)
                s2 = _dot_i8(wib_ref[pi], data4b)         # [4*rows, R*n2]
                s2_m = [s2[m * rows:(m + 1) * rows
                           ].reshape(bt, n1, R * n2) for m in range(4)]
            add2 = [cib_ref[pi, m] for m in range(4)]
            # fold=False output < 3p + 2^26: one condsub makes it a
            # lazy (< 2p) residue, which the Horner Garner chain accepts
            # for i >= 1; only prime 0's digit needs the exact reduction
            x = _recombine_mxu(s2_m, add2, dib_ref[pi], rc[pi], p,
                               fold=False)                # [bt, n1, R*n2]
            x = _condsub2p(x, p)
            if pi == 0:
                x = _reduce_lt_p(x, p, primes[0])
            for r in range(R):
                res[pi][r] = x[..., r * n2:(r + 1) * n2]

        # ---- 6. Garner -> delta; update the resident accumulator ------------
        for r in range(R):
            if "garner" in ablate:
                d_lo = res[0][r]
                d_hi = res[P - 1][r]
            elif "gcombine" in ablate:   # profile: digit chain only
                t = _garner_digits_horner([res[i][r] for i in range(P)],
                                          primes, g_hinv)
                d_lo = t[0]
                d_hi = t[P - 1]
            elif "gdigits" in ablate:    # profile: combine only
                t = [res[i][r] for i in range(P)]
                d_hi, d_lo = _garner_combine_u64(t, prefix, half_digits, m_mod)
            else:
                t = _garner_digits_horner([res[i][r] for i in range(P)],
                                          primes, g_hinv)
                d_hi, d_lo = _garner_combine_u64(t, prefix, half_digits, m_mod)
            if mode == "delta":
                s_lo = out_lo_ref[:, r] + d_lo
                carry = (s_lo < d_lo).astype(U32)
                out_lo_ref[:, r] = s_lo
                out_hi_ref[:, r] = out_hi_ref[:, r] + d_hi + carry
            else:
                out_lo_ref[:, r] = d_lo
                out_hi_ref[:, r] = d_hi

    if not loop_steps:
        return kernel

    # ---- loop variant: steps ride an in-kernel fori_loop, not the grid ----
    # The grid collapses to batch tiles only; the per-grid-cell Mosaic
    # iteration overhead (~2.4 µs x 742 steps x batch tiles — the measured
    # ~116 ms "floor" at batch 512, docs/PERFORMANCE.md) is paid once per
    # TILE instead of once per step.  The BSK stays in HBM (ANY space) and
    # each step's slice is manually double-buffered: slot 0/1 VMEM scratch,
    # one DMA semaphore per slot so a wait can never be satisfied by the
    # other slot's completions.  Each fori iteration runs TWO steps with
    # static slot numbers, so every buffer index in the compute body stays
    # static.
    n_steps = loop_steps
    assert n_steps % 2 == 0

    def kernel_loop(idx_ref, acc_hi_in, acc_lo_in, bsk_any, bsk_sh_any,
                    tab_ref, tab_sh_ref,
                    wfa_ref, ca_ref, da_ref, tf_ref, tf_sh_ref, wfb_ref,
                    cb_ref, wia_ref, cia_ref, ti_ref, ti_sh_ref, wib_ref,
                    cib_ref, dib_ref, out_hi_ref, out_lo_ref,
                    bsk_buf, bsk_sh_buf, ph_vmem, ph_sh_vmem,
                    sem_b0, sem_b1, sem_p0, sem_p1):
        rows = bt * n1

        def step_copies(j, slot, start):
            """Issue (start=True) or rebuild-for-wait (start=False) the DMAs
            feeding step j into buffer slot `slot`.  Waits only need dst+sem,
            so rebuilding the descriptors next iteration is sound."""
            s32 = np.int32(slot)
            sem_b = (sem_b0, sem_b1)[slot]
            sem_p = (sem_p0, sem_p1)[slot]
            cs = []
            for src, dst in ((bsk_any, bsk_buf), (bsk_sh_any, bsk_sh_buf)):
                c = pltpu.make_async_copy(src.at[j], dst.at[s32], sem_b)
                if start:
                    c.start()
                cs.append(c)
            if "phase" not in ablate:
                for b in range(bt):
                    for v in range(NV):
                        e = (idx_ref[b, j] if NV == 1 else
                             idx_ref[b * NV + v, j])
                        b32, v32 = np.int32(b), np.int32(v)
                        dst = (ph_vmem.at[s32, b32] if NV == 1 else
                               ph_vmem.at[s32, b32, v32])
                        dsh = (ph_sh_vmem.at[s32, b32] if NV == 1 else
                               ph_sh_vmem.at[s32, b32, v32])
                        c1 = pltpu.make_async_copy(tab_ref.at[e], dst, sem_p)
                        c2 = pltpu.make_async_copy(tab_sh_ref.at[e], dsh,
                                                   sem_p)
                        if start:
                            c1.start()
                            c2.start()
                        cs += [c1, c2]
            return cs

        out_hi_ref[...] = acc_hi_in[...]
        out_lo_ref[...] = acc_lo_in[...]
        step_copies(np.int32(0), 0, start=True)
        n_iters = np.int32(n_steps // 2)

        def run(sub, waits):
            _do_step(sub, waits, bsk_buf, bsk_sh_buf,
                     wfa_ref, ca_ref, da_ref, tf_ref, tf_sh_ref, wfb_ref,
                     cb_ref, wia_ref, cia_ref, ti_ref, ti_sh_ref, wib_ref,
                     cib_ref, dib_ref, out_hi_ref, out_lo_ref,
                     ph_vmem, ph_sh_vmem, rows)

        def body(i):
            a = i * np.int32(2)
            b = a + np.int32(1)
            step_copies(b, 1, start=True)          # overlaps compute of a
            run(0, step_copies(a, 0, start=False))

            @pl.when(i + np.int32(1) < n_iters)
            def _prefetch():                       # overlaps compute of b
                step_copies(a + np.int32(2), 0, start=True)

            run(1, step_copies(b, 1, start=False))
            return i + np.int32(1)

        # while_loop, not fori_loop: fori with concrete bounds lowers to a
        # scan whose counter is i64 under x64 mode, and Mosaic's i64 convert
        # lowering recurses (CLAUDE.md gotcha).  The while carry keeps the
        # i32 dtype it is given.
        jax.lax.while_loop(lambda i: i < n_iters, body, np.int32(0))

    return kernel_loop


def blind_rotate_fused(lut_data, lwe_data, bsk_u32, bsk_sh_u32, mono_tab,
                       mono_sh, decomp: DecompParams, log_q: int = 64,
                       block_b: int = 8, interpret: bool = False,
                       grouping: int = 1, mode: str = "delta",
                       ablate: frozenset = frozenset(),
                       steps_per_cell: int | None = None):
    """Full blind rotation as ONE pallas_call (grid = batch tiles x
    step cells, each cell spanning `steps_per_cell` consecutive steps).

    mode="delta": bsk_u32 [n_in, P, J, R, N] (plain GGSW spectra, four-step
    order); mode="multibit": bsk_u32 [n/g, 2^g, P, J, R, N].  mono_tab/sh:
    the [2n, P, N1, N2] full-exponent tables ((X^e - 1) for delta, X^e for
    multibit).  Returns the rotated accumulator [B, R, N] u64.

    steps_per_cell defaults to env TFHE_TPU_STEPS_PER_CELL (else 1); any
    value that does not divide the step count falls back to 1."""
    import os

    from ..algorithms.bootstrap import modulus_switch
    from . import fourstep as fs
    from . import monomial_mul

    n_steps = bsk_u32.shape[0]
    if mode == "delta":
        num_primes, glwe_size = bsk_u32.shape[1], bsk_u32.shape[3]
    else:
        num_primes, glwe_size = bsk_u32.shape[2], bsk_u32.shape[4]
    # spectra arrive flat [..., N] or pre-tiled [..., N1, N2] (large-N
    # callers retile host-side: the in-jit retiling reshape is a physical
    # HBM copy of the whole key)
    flat_ndim = 5 if mode == "delta" else 6
    pre_tiled = bsk_u32.ndim == flat_ndim + 1
    n = (bsk_u32.shape[-2] * bsk_u32.shape[-1] if pre_tiled
         else bsk_u32.shape[-1])
    n1, n2 = fs._split_nm(n)
    V = 1 << grouping
    NV = 1 if mode == "delta" else V - 1
    batch = lwe_data.shape[:-1]

    bt = min(block_b, max(int(np.prod(batch)), 1))
    flat_b = int(np.prod(batch)) if batch else 1
    pad = _padded_flat_batch(flat_b, bt) - flat_b
    if pad:
        lwe_data = jnp.concatenate(
            [lwe_data.reshape(flat_b, -1),
             jnp.zeros((pad, lwe_data.shape[-1]), lwe_data.dtype)], axis=0)
    else:
        lwe_data = lwe_data.reshape(max(flat_b, 1), -1)
    B = lwe_data.shape[0]

    switched = modulus_switch(lwe_data, log_q, n)
    a_sw, b_sw = switched[..., :-1], switched[..., -1]
    mask = 2 * n - 1
    if mode == "delta":
        idx2d = (a_sw & mask).astype(jnp.int32)                  # [B, n_in]
        # one batch tile x ALL steps per block: Mosaic needs the last block
        # dim equal to the array dim (or 128-divisible) even in SMEM
        idx_spec = pl.BlockSpec((bt, n_steps),
                                lambda i, j, _z=np.int32(0): (i, _z),
                                memory_space=pltpu.SMEM)
    else:
        sel = jnp.asarray([[(v >> (grouping - 1 - i)) & 1
                            for i in range(grouping)]
                           for v in range(1, V)], dtype=jnp.int32)  # [V-1, g]
        a_grp = a_sw.reshape(B, n_steps, grouping)
        c_v = jnp.einsum("bjg,vg->bjv", a_grp, sel) & mask       # [B, steps, V-1]
        idx2d = c_v.transpose(0, 2, 1).reshape(B * NV, n_steps).astype(jnp.int32)
        idx_spec = pl.BlockSpec((bt * NV, n_steps),
                                lambda i, j, _z=np.int32(0): (i, _z),
                                memory_space=pltpu.SMEM)

    acc = monomial_mul(_lut_full(lut_data, batch, flat_b, pad),
                       (2 * n - b_sw)[..., None])
    acc_hi = (acc >> jnp.uint64(32)).astype(jnp.uint32)
    acc_lo = acc.astype(jnp.uint32)
    acc_hi = acc_hi.reshape(acc_hi.shape[:-1] + (n1, n2))
    acc_lo = acc_lo.reshape(acc_lo.shape[:-1] + (n1, n2))
    if not pre_tiled:
        # flat [..., N] spectra: retile to [..., N1, N2].  Inside jit this
        # reshape is a PHYSICAL copy (tiled-layout change), which at 4_4
        # doubles 2x 3.89 GB of key in HBM — large-N callers pre-reshape
        # host-side (bench.py) and skip this branch.
        bsk_u32 = bsk_u32.reshape(bsk_u32.shape[:-1] + (n1, n2))
        bsk_sh_u32 = bsk_sh_u32.reshape(bsk_sh_u32.shape[:-1] + (n1, n2))
    if mono_tab is None:   # eager/test path only (see blind_rotate_pallas)
        tab, tab_sh = fs.monomial_tables_for(n, num_primes, mode == "delta")
        mono_tab, mono_sh = jnp.asarray(tab), jnp.asarray(tab_sh)
    # a factored phase stack (rows != 2n) carries X^{e_lo} / X^{S e_hi}
    # halves; the kernel recombines them (fourstep.monomial_split_tables)
    mono_log_s = (fs.monomial_split_log_s(n)
                  if mono_tab.shape[0] != 2 * n else 0)

    spc = steps_per_cell
    if spc is None:
        spc = int(os.environ.get("TFHE_TPU_STEPS_PER_CELL", "1"))
    if spc < 1 or n_steps % spc != 0:
        spc = 1
    # Opt-in (measured SLOWER: 762 vs 830 PBS/s classic batch 512 — the
    # while-loop's per-iteration semaphore waits and lost cross-cell Mosaic
    # pipelining outweigh the removed grid-cell overhead; docs/PERFORMANCE.md)
    use_loop = (os.environ.get("TFHE_TPU_ROTATION_LOOP", "0") == "1"
                and n_steps % 2 == 0 and spc == 1 and mono_log_s == 0)

    plan = get_plan(n, num_primes)
    primes = [int(p) for p in plan.primes]
    assert all(p < (1 << 30) for p in primes)
    kt = fs.get_kernel_tables(n, num_primes, bt)
    # TFHE_TPU_SUBBT=2: dense per-pair dots for the blockdiagonal stages
    # (see _make_rotation_kernel_mxu docstring) — the wfa/wib tables shrink
    # to the sub_bt embedding.  At N=2048 this measured slightly slower
    # (801 vs 839 PBS/s) and stays opt-in; for N > 4096 it is the DEFAULT:
    # the bt-blockdiagonal tables grow as (bt*N1)^2 (29 MB of VMEM at
    # N=8192) and the wasted blockdiag MACs scale the same way, so the
    # dense sub-group form wins on both counts there.
    sub_default = "0" if n <= 4096 else str(max(1, 128 // n1))
    sub_bt = int(os.environ.get("TFHE_TPU_SUBBT", sub_default))
    if sub_bt and not (bt % sub_bt) and sub_bt < bt:
        kt_sub = fs.get_kernel_tables(n, num_primes, sub_bt)
        kt = kt._replace(wfa=kt_sub.wfa, wib=kt_sub.wib)
    else:
        sub_bt = 0
    kernel = _make_rotation_kernel_mxu(n, num_primes, glwe_size, decomp,
                                       primes, log_q, grouping=grouping,
                                       mode=mode, bt=bt, interpret=interpret,
                                       ablate=ablate, spc=spc,
                                       loop_steps=n_steps if use_loop else 0,
                                       sub_bt=sub_bt, mono_log_s=mono_log_s)

    grid = (B // bt,) if use_loop else (B // bt, n_steps // spc)
    vm = pltpu.VMEM
    zero = np.int32(0)
    nmaps = len(grid)

    def bcast(shape):
        return pl.BlockSpec(shape, lambda *a, _z=zero, _r=len(shape):
                            (_z,) * _r, memory_space=vm)

    def tiled(shape):
        return pl.BlockSpec((bt,) + shape[1:],
                            lambda i, *a, _z=zero, _r=len(shape) - 1:
                            (i,) + (_z,) * _r, memory_space=vm)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    if use_loop:
        bsk_spec = any_spec
        idx_spec = pl.BlockSpec(idx_spec.block_shape,
                                lambda i, _z=np.int32(0): (i, _z),
                                memory_space=pltpu.SMEM)
    else:
        bsk_spec = pl.BlockSpec((spc,) + bsk_u32.shape[1:],
                                lambda i, j, _z=zero, _r=bsk_u32.ndim - 1:
                                (j,) + (_z,) * _r, memory_space=vm)
    # the rotation kernel rides all J transforms on the lane axis: the
    # middle twiddle is lane-tiled J-wide (transform-independent values)
    J = decomp.level * glwe_size
    tf_j = np.tile(np.asarray(kt.tf), (1, 1, J))
    tf_sh_j = np.tile(np.asarray(kt.tf_sh), (1, 1, J))
    tables = (kt.wfa, kt.ca, kt.da, tf_j, tf_sh_j, kt.wfb, kt.cb,
              kt.wia, kt.cia, kt.ti, kt.ti_sh, kt.wib, kt.cib, kt.dib)
    in_specs = ([idx_spec, tiled(acc_hi.shape), tiled(acc_lo.shape),
                 bsk_spec, bsk_spec, any_spec, any_spec]
                + [bcast(t.shape) for t in tables])
    out_specs = (tiled(acc_hi.shape), tiled(acc_lo.shape))
    out_shape = (jax.ShapeDtypeStruct(acc_hi.shape, jnp.uint32),
                 jax.ShapeDtypeStruct(acc_lo.shape, jnp.uint32))
    ph_lead = (2,) if use_loop else (spc,)
    ph_mid = (2,) if mono_log_s else ()        # factored lo/hi halves
    ph_shape = (ph_lead + (bt,) + ph_mid + (num_primes, n1, n2)
                if mode == "delta" else
                ph_lead + (bt, NV) + ph_mid + (num_primes, n1, n2))
    if use_loop:
        scratch = [pltpu.VMEM((2,) + bsk_u32.shape[1:], jnp.uint32),
                   pltpu.VMEM((2,) + bsk_u32.shape[1:], jnp.uint32),
                   pltpu.VMEM(ph_shape, jnp.uint32),
                   pltpu.VMEM(ph_shape, jnp.uint32)] + \
                  [pltpu.SemaphoreType.DMA] * 4
    else:
        scratch = [pltpu.VMEM(ph_shape, jnp.uint32),
                   pltpu.VMEM(ph_shape, jnp.uint32),
                   pltpu.SemaphoreType.DMA]
    # For N > 4096 the working set (stage tables + accumulator tiles +
    # matmul transients) exceeds Mosaic's 16 MB default scoped-vmem limit,
    # but the v5e physically allocates >= 110 MB (measured,
    # tools/vmem_probe.py) — raise the cap for the high-N parameter
    # regimes (3_3 at N=8192, 4_4 at N=32768) instead of refusing them.
    cp_kwargs = dict(dimension_semantics=("arbitrary",) * nmaps)
    if n > 4096:
        cp_kwargs["vmem_limit_bytes"] = (
            int(os.environ.get("TFHE_TPU_VMEM_MB", "110")) << 20)
    acc_hi_r, acc_lo_r = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(**cp_kwargs),
    )(idx2d, acc_hi, acc_lo, bsk_u32, bsk_sh_u32, mono_tab, mono_sh,
      *(jnp.asarray(t) for t in tables))

    acc_hi_r = acc_hi_r.reshape(acc_hi_r.shape[:-2] + (n,))
    acc_lo_r = acc_lo_r.reshape(acc_lo_r.shape[:-2] + (n,))
    out = (acc_hi_r.astype(jnp.uint64) << jnp.uint64(32)) | \
        acc_lo_r.astype(jnp.uint64)
    out = out[:flat_b] if pad else out
    return out.reshape(batch + out.shape[-2:])


def blind_rotate_pallas(lut_data, lwe_data, paired_u32, paired_sh_u32,
                        decomp: DecompParams, log_q: int = 64,
                        block_b: int = 8, interpret: bool = False,
                        mxu: bool = False, mono_tab=None, mono_sh=None,
                        lanes: bool = False):
    """Full blind rotation with the fused step kernel.

    lut_data [R, N] u64 torus; lwe_data [B, n_in+1] u64.
    Butterfly kernel (mxu=False): paired_u32 [n_in, 2, P, J, R, N] u32
    (+ shoup twin) in DIF spectral order — the paired (GGSW(1-s), GGSW(s))
    phase-domain form.
    MXU kernel (mxu=True): paired_u32 [n_in, P, J, R, N] — the plain GGSW(s)
    spectra in FOUR-STEP order; the step runs as a delta-CMUX with the
    (X^a - 1) phase gathered per batch element from the HBM exponent table.
    Returns the rotated accumulator [B, R, N] u64."""
    from ..algorithms.bootstrap import modulus_switch
    from . import monomial_mul

    n_in = paired_u32.shape[0]
    if mxu:
        assert paired_u32.ndim == 5, "MXU path expects delta-form spectra"
        num_primes = paired_u32.shape[1]
        glwe_size = paired_u32.shape[3]
    else:
        num_primes = paired_u32.shape[2]
        glwe_size = paired_u32.shape[4]
    n = paired_u32.shape[-1]
    batch = lwe_data.shape[:-1]

    # pad the batch to a multiple of the kernel tile
    bt = min(block_b, max(int(np.prod(batch)), 1))
    flat_b = int(np.prod(batch)) if batch else 1
    pad = _padded_flat_batch(flat_b, bt) - flat_b
    if pad:
        lwe_data = jnp.concatenate(
            [lwe_data.reshape(flat_b, -1),
             jnp.zeros((pad, lwe_data.shape[-1]), lwe_data.dtype)], axis=0)
    else:
        lwe_data = lwe_data.reshape(max(flat_b, 1), -1)

    switched = modulus_switch(lwe_data, log_q, n)
    a_sw, b_sw = switched[..., :-1], switched[..., -1]
    acc = monomial_mul(_lut_full(lut_data, batch, flat_b, pad),
                       (2 * n - b_sw)[..., None])
    acc_hi = (acc >> jnp.uint64(32)).astype(jnp.uint32)
    acc_lo = acc.astype(jnp.uint32)
    if mxu:
        from . import fourstep as fs
        n1, n2 = fs._split_nm(n)
        Bp = acc_hi.shape[0]
        acc_hi = acc_hi.reshape(acc_hi.shape[:-1] + (n1, n2))
        acc_lo = acc_lo.reshape(acc_lo.shape[:-1] + (n1, n2))
        if lanes:   # [B, R, N1, N2] -> [R, N1, B*N2] (batch into lanes)
            acc_hi = acc_hi.transpose(1, 2, 0, 3).reshape(glwe_size, n1, -1)
            acc_lo = acc_lo.transpose(1, 2, 0, 3).reshape(glwe_size, n1, -1)
        paired_u32 = paired_u32.reshape(paired_u32.shape[:-1] + (n1, n2))
        paired_sh_u32 = paired_sh_u32.reshape(paired_sh_u32.shape[:-1] + (n1, n2))
        if mono_tab is None:
            # eager/test path only — inside jit this would bake a ~128 MB
            # constant into the HLO; the key entity carries the tables there
            tab, tab_sh = (fs.monomial_full_tables_lanes(n, num_primes, True)
                           if lanes else
                           fs.monomial_full_tables(n, num_primes, True))
            mono_tab, mono_sh = jnp.asarray(tab), jnp.asarray(tab_sh)
        # the exponent axis sits at 2 in the lanes layout [P, N1, 2n, N2]
        # and at 0 in the rows layout [2n, P, N1, N2]
        if mono_tab.shape[2 if lanes else 0] != 2 * n:
            raise NotImplementedError(
                "factored phase tables (N >= fourstep.MONO_SPLIT_MIN_N) are "
                "only supported by the whole-rotation fused kernel "
                "(config.use_fused_rotation)")
        tabs, tabs_sh = mono_tab, mono_sh
        mask = 2 * n - 1
        step_mxu = (blind_rotate_step_pallas_mxu_lanes if lanes else
                    blind_rotate_step_pallas_mxu)
        gather_axis = 2 if lanes else 0

        def step(j, carry):
            hi, lo = carry
            idx = a_sw[..., j] & mask                 # X^{2N} = X^0
            ph = jnp.take(tabs, idx, axis=gather_axis)
            ph_sh = jnp.take(tabs_sh, idx, axis=gather_axis)
            bsk_j = jax.lax.dynamic_index_in_dim(paired_u32, j, 0, keepdims=False)
            sh_j = jax.lax.dynamic_index_in_dim(paired_sh_u32, j, 0, keepdims=False)
            return step_mxu(
                ph, ph_sh, hi, lo, bsk_j, sh_j, decomp, n=n,
                num_primes=num_primes, glwe_size=glwe_size, block_b=block_b,
                interpret=interpret, log_q=log_q, mode="delta")
    else:
        def step(j, carry):
            hi, lo = carry
            aj = a_sw[..., j]
            bsk_j = jax.lax.dynamic_index_in_dim(paired_u32, j, 0, keepdims=False)
            sh_j = jax.lax.dynamic_index_in_dim(paired_sh_u32, j, 0, keepdims=False)
            return blind_rotate_step_pallas(
                aj, hi, lo, bsk_j, sh_j, decomp, n=n, num_primes=num_primes,
                glwe_size=glwe_size, block_b=block_b, interpret=interpret,
                log_q=log_q)

    acc_hi, acc_lo = jax.lax.fori_loop(0, n_in, step, (acc_hi, acc_lo))
    if mxu:
        if lanes:   # [R, N1, B*N2] -> [B, R, N1, N2]
            acc_hi = acc_hi.reshape(glwe_size, n1, Bp, n2).transpose(2, 0, 1, 3)
            acc_lo = acc_lo.reshape(glwe_size, n1, Bp, n2).transpose(2, 0, 1, 3)
        acc_hi = acc_hi.reshape(acc_hi.shape[:-2] + (n,))
        acc_lo = acc_lo.reshape(acc_lo.shape[:-2] + (n,))
    out = (acc_hi.astype(jnp.uint64) << jnp.uint64(32)) | acc_lo.astype(jnp.uint64)
    out = out[:flat_b] if pad else out
    return out.reshape(batch + out.shape[-2:])


def multi_bit_blind_rotate_pallas(lut_data, lwe_data, mb_u32, mb_sh_u32,
                                  decomp: DecompParams, grouping: int,
                                  log_q: int = 64, block_b: int = 8,
                                  interpret: bool = False, mxu: bool = False,
                                  mono_tab=None, mono_sh=None,
                                  lanes: bool = False):
    """Fused multibit blind rotation: n/g steps, 2^g GGSW variants per step.

    mb_u32 [n/g, 2^g, P, J, R, N] u32 (+ shoup twin); four-step spectral
    order when mxu=True."""
    from ..algorithms.bootstrap import modulus_switch
    from . import monomial_mul

    num_groups = mb_u32.shape[0]
    num_primes = mb_u32.shape[2]
    glwe_size = mb_u32.shape[4]
    n = mb_u32.shape[-1]
    batch = lwe_data.shape[:-1]

    bt = min(block_b, max(int(np.prod(batch)), 1))
    flat_b = int(np.prod(batch)) if batch else 1
    pad = _padded_flat_batch(flat_b, bt) - flat_b
    if pad:
        lwe_data = jnp.concatenate(
            [lwe_data.reshape(flat_b, -1),
             jnp.zeros((pad, lwe_data.shape[-1]), lwe_data.dtype)], axis=0)
    else:
        lwe_data = lwe_data.reshape(max(flat_b, 1), -1)

    switched = modulus_switch(lwe_data, log_q, n)
    a_sw, b_sw = switched[..., :-1], switched[..., -1]
    acc = monomial_mul(_lut_full(lut_data, batch, flat_b, pad),
                       (2 * n - b_sw)[..., None])
    acc_hi = (acc >> jnp.uint64(32)).astype(jnp.uint32)
    acc_lo = acc.astype(jnp.uint32)
    if mxu:
        from . import fourstep as fs
        n1, n2 = fs._split_nm(n)
        Bp = acc_hi.shape[0]
        acc_hi = acc_hi.reshape(acc_hi.shape[:-1] + (n1, n2))
        acc_lo = acc_lo.reshape(acc_lo.shape[:-1] + (n1, n2))
        if lanes:
            acc_hi = acc_hi.transpose(1, 2, 0, 3).reshape(glwe_size, n1, -1)
            acc_lo = acc_lo.transpose(1, 2, 0, 3).reshape(glwe_size, n1, -1)
        mb_u32 = mb_u32.reshape(mb_u32.shape[:-1] + (n1, n2))
        mb_sh_u32 = mb_sh_u32.reshape(mb_sh_u32.shape[:-1] + (n1, n2))
        if mono_tab is None:
            # eager/test path only — see blind_rotate_pallas
            tab, tab_sh = (fs.monomial_full_tables_lanes(n, num_primes, False)
                           if lanes else
                           fs.monomial_full_tables(n, num_primes, False))
            mono_tab, mono_sh = jnp.asarray(tab), jnp.asarray(tab_sh)
        tabs, tabs_sh = mono_tab, mono_sh
        mask = 2 * n - 1
        V = 1 << grouping
        # variant v (MSB of v <-> first group bit) selects group bit i when
        # (v >> (g-1-i)) & 1; c_v = sum of the selected mod-switched a's
        sel = jnp.asarray([[(v >> (grouping - 1 - i)) & 1
                            for i in range(grouping)]
                           for v in range(1, V)], dtype=jnp.int32)  # [V-1, g]
        step_mxu = (blind_rotate_step_pallas_mxu_lanes if lanes else
                    blind_rotate_step_pallas_mxu)
        gather_axis = 2 if lanes else 0

        def step(j, carry):
            hi, lo = carry
            a_grp = jax.lax.dynamic_slice_in_dim(a_sw, j * grouping, grouping,
                                                 axis=-1)            # [B, g]
            c_v = (a_grp[:, None, :] * sel[None]).sum(-1) & mask     # [B, V-1]
            # rows layout: [B, V-1, P, N1, N2]; lanes: [P, N1, B, V-1, N2]
            ph = jnp.take(tabs, c_v, axis=gather_axis)
            ph_sh = jnp.take(tabs_sh, c_v, axis=gather_axis)
            bsk_j = jax.lax.dynamic_index_in_dim(mb_u32, j, 0, keepdims=False)
            sh_j = jax.lax.dynamic_index_in_dim(mb_sh_u32, j, 0, keepdims=False)
            return step_mxu(
                ph, ph_sh, hi, lo, bsk_j, sh_j, decomp, n=n,
                num_primes=num_primes, glwe_size=glwe_size, block_b=bt,
                interpret=interpret, log_q=log_q, grouping=grouping,
                mode="multibit")
    else:
        def step(j, carry):
            hi, lo = carry
            a_grp = jax.lax.dynamic_slice_in_dim(a_sw, j * grouping, grouping,
                                                 axis=-1)
            bsk_j = jax.lax.dynamic_index_in_dim(mb_u32, j, 0, keepdims=False)
            sh_j = jax.lax.dynamic_index_in_dim(mb_sh_u32, j, 0, keepdims=False)
            return blind_rotate_step_pallas(
                a_grp, hi, lo, bsk_j, sh_j, decomp, n=n, num_primes=num_primes,
                glwe_size=glwe_size, block_b=bt, interpret=interpret,
                log_q=log_q, grouping=grouping)

    acc_hi, acc_lo = jax.lax.fori_loop(0, num_groups, step, (acc_hi, acc_lo))
    if mxu:
        if lanes:
            acc_hi = acc_hi.reshape(glwe_size, n1, Bp, n2).transpose(2, 0, 1, 3)
            acc_lo = acc_lo.reshape(glwe_size, n1, Bp, n2).transpose(2, 0, 1, 3)
        acc_hi = acc_hi.reshape(acc_hi.shape[:-2] + (n,))
        acc_lo = acc_lo.reshape(acc_lo.shape[:-2] + (n,))
    out = (acc_hi.astype(jnp.uint64) << jnp.uint64(32)) | acc_lo.astype(jnp.uint64)
    out = out[:flat_b] if pad else out
    return out.reshape(batch + out.shape[-2:])
