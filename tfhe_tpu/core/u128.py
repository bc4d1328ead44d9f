"""Two-limb (hi, lo) uint64 arithmetic for the 2^128 ciphertext modulus.

The reference supports a u128 ciphertext modulus through a dedicated f128
FFT backend (fft_impl/fft128/) and u128 scalar entities.  JAX has no uint128
dtype, so a 128-bit torus element is a trailing limb axis: `[..., 2]` uint64
with limb 0 = high 64 bits, limb 1 = low 64 bits.  Everything here is
branch-free elementwise u64 arithmetic (adds/compares/multiplies — no
division), so it vectorizes on the VPU exactly like the 64-bit torus path.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

U64 = jnp.uint64
_M32 = (1 << 32) - 1


def make128(hi, lo):
    return jnp.stack([jnp.asarray(hi, U64), jnp.asarray(lo, U64)], axis=-1)


def hi_lo(x):
    return x[..., 0], x[..., 1]


def from_python_int(v: int, shape=()):
    v %= 1 << 128
    hi = np.full(shape, (v >> 64) & ((1 << 64) - 1), dtype=np.uint64)
    lo = np.full(shape, v & ((1 << 64) - 1), dtype=np.uint64)
    return make128(hi, lo)


def to_python_ints(x) -> np.ndarray:
    """object-dtype numpy array of python ints (host-side, for tests)."""
    hi = np.asarray(x[..., 0]).astype(object)
    lo = np.asarray(x[..., 1]).astype(object)
    return (hi << 64) | lo


def zeros128(shape):
    return jnp.zeros(tuple(shape) + (2,), dtype=U64)


def add128(a, b):
    ah, al = hi_lo(a)
    bh, bl = hi_lo(b)
    lo = al + bl
    carry = (lo < al).astype(U64)
    return make128(ah + bh + carry, lo)


def sub128(a, b):
    ah, al = hi_lo(a)
    bh, bl = hi_lo(b)
    borrow = (al < bl).astype(U64)
    return make128(ah - bh - borrow, al - bl)


def neg128(a):
    ah, al = hi_lo(a)
    lo = U64(0) - al
    return make128(~ah + (al == 0).astype(U64), lo)


def where128(cond, a, b):
    return jnp.where(cond[..., None], a, b)


def mul_u64_by_u128(t, c_hi: int, c_lo: int):
    """t (u64 array, values < 2^32) times the python-int constant
    c_hi·2^64 + c_lo, mod 2^128.  Needs the high half of t·c_lo, obtained
    from a 32-bit split (t < 2^32 keeps every partial product in range)."""
    t = jnp.asarray(t, U64)
    cl_hi, cl_lo = U64(c_lo >> 32), U64(c_lo & _M32)
    mid = t * cl_hi                        # < 2^62
    lo = (mid << U64(32)) + t * cl_lo
    carry = (lo < (mid << U64(32))).astype(U64)
    hi = (mid >> U64(32)) + t * U64(c_hi % (1 << 64)) + carry
    return make128(hi, lo)


def mul_small_signed_by_128(d, x):
    """d (signed int array, |d| < 2^31) times x ([..., 2] u128), mod 2^128.
    Used by the 128-bit keyswitch MAC."""
    d = jnp.asarray(d)
    mag = jnp.abs(d).astype(U64)           # < 2^31
    xh, xl = hi_lo(x)
    xl_hi, xl_lo = xl >> U64(32), xl & U64(_M32)
    mid = mag * xl_hi
    lo = (mid << U64(32)) + mag * xl_lo
    carry = (lo < (mid << U64(32))).astype(U64)
    hi = (mid >> U64(32)) + mag * xh + carry
    prod = make128(hi, lo)
    return where128(d < 0, neg128(prod), prod)


def sum128(x, axis: int):
    """Sum of u128 values along value-axis `axis` (limb axis excluded: axis
    -1 is the last axis *before* the trailing limb pair), carry-exact for
    up to 2^32 terms: low limbs are summed as two 32-bit half-sums (each
    fits u64), the spilled bits carry into the high-limb sum."""
    hi, lo = hi_lo(x)                       # limb axis gone: `axis` is direct
    lo_l = (lo & U64(_M32)).sum(axis=axis)
    lo_h = (lo >> U64(32)).sum(axis=axis)
    total_h = lo_h + (lo_l >> U64(32))
    out_lo = (lo_l & U64(_M32)) | (total_h << U64(32))
    carry = total_h >> U64(32)
    return make128(hi.sum(axis=axis) + carry, out_lo)


def uniform128(key, shape):
    from . import rng
    hi_lo_bits = rng.uniform_torus(key, (2,) + tuple(shape), 64)
    return make128(hi_lo_bits[0], hi_lo_bits[1])


def gaussian_noise128(key, shape, std: float):
    """Rounded gaussian with absolute std-dev `std` in units of 2^-128·q
    (i.e. `std` is the plain torus-integer standard deviation, possibly
    > 2^64).  f64 carries ~53 significant bits — ample for noise."""
    import jax

    if std == 0.0:
        return zeros128(shape)
    v = jax.random.normal(key, shape, dtype=jnp.float64) * np.float64(std)
    hi_f = jnp.floor(v * np.float64(2.0 ** -64))
    frac = v * np.float64(2.0 ** -64) - hi_f
    lo = jnp.minimum(jnp.floor(frac * np.float64(2.0 ** 64)),
                     np.float64(2.0 ** 64 - 2 ** 11))
    hi = hi_f.astype(jnp.int64).astype(U64)
    return make128(hi, lo.astype(U64))
