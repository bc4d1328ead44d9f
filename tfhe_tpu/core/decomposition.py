"""Signed (balanced) gadget decomposition.

Vectorized re-design of the reference's `SignedDecomposer`
(tfhe/src/core_crypto/commons/math/decomposition/decomposer.rs:15): round the
torus element to the closest multiple of q/B^L, then emit L balanced base-B
digits d_l ∈ [-B/2, B/2) such that  x ≈ Σ_l d_l · q/B^(l+1).

The whole computation is branch-free elementwise integer arithmetic — one
fused pass over [batch, ..., N] arrays (no per-coefficient iterators).
Digits are returned as int64 (they are small; the NTT reduces them mod p).
"""
from __future__ import annotations

import jax.numpy as jnp

from .params import DecompParams


def signed_decompose(x, decomp: DecompParams, log_q: int):
    """x: unsigned torus array [...] → digits int64 [..., L], level-major
    (index l has weight q/B^(l+1); index 0 is the most significant digit)."""
    b_log, levels = decomp.base_log, decomp.level
    x = jnp.asarray(x)
    u64 = x.dtype

    shift = log_q - b_log * levels
    # round to closest representable (guard-bit round half-up, wrapping)
    s = (x + (u64.type(1) << u64.type(shift - 1))) >> u64.type(shift) if shift > 0 else x
    return _balanced_digits(s.astype(jnp.uint64), b_log, levels)


def _balanced_digits(s, b_log: int, levels: int):
    """Rounded top-bits value s → L balanced base-2^b_log digits, level-major."""
    base = 1 << b_log
    half = base >> 1
    digits_lsb = []
    for _ in range(levels):
        raw = s & jnp.uint64(base - 1)
        carry = (raw + jnp.uint64(half)) >> jnp.uint64(b_log)   # 1 iff raw >= B/2
        d = raw.astype(jnp.int64) - (carry.astype(jnp.int64) << b_log)
        s = (s >> jnp.uint64(b_log)) + carry
        digits_lsb.append(d)
    # LSB-first corresponds to level L-1 down to 0
    return jnp.stack(digits_lsb[::-1], axis=-1)


def signed_decompose128(x128, decomp: DecompParams):
    """128-bit-modulus signed decomposition: x128 [..., 2] (hi, lo) u64 →
    digits int64 [..., L].  Requires base_log·level <= 64 (all the digits
    live in the high limb — true for every practical 128-bit parameter set),
    so only the round-carry can involve the low limb."""
    b_log, levels = decomp.base_log, decomp.level
    shift = 128 - b_log * levels
    assert shift >= 64, "base_log*level must be <= 64 at a 2^128 modulus"
    hi, lo = x128[..., 0], x128[..., 1]
    if shift - 1 >= 64:
        hi_r = hi + (jnp.uint64(1) << jnp.uint64(shift - 1 - 64))
    else:  # shift == 64: the round guard bit is the low limb's MSB
        hi_r = hi + (lo >> jnp.uint64(63))
    s = hi_r >> jnp.uint64(shift - 64) if shift > 64 else hi_r
    return _balanced_digits(s, b_log, levels)


def recompose(digits, decomp: DecompParams, log_q: int):
    """Inverse of `signed_decompose` (up to the rounding): Σ d_l · q/B^(l+1)."""
    b_log, levels = decomp.base_log, decomp.level
    dt = jnp.uint64 if log_q == 64 else jnp.uint32
    acc = jnp.zeros(digits.shape[:-1], dtype=dt)
    for l in range(levels):
        w = dt(1) << dt(log_q - b_log * (l + 1))
        acc = acc + digits[..., l].astype(jnp.int64).astype(dt) * w
    return acc
