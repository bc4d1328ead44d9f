"""Torus arithmetic primitives.

The discretized torus T_q (q = 2^32 or 2^64) is represented as unsigned
integer JAX arrays (`uint32` / `uint64`); wrapping semantics of unsigned
arithmetic give torus addition for free.  This replaces the reference's
`UnsignedTorus` trait machinery (tfhe/src/core_crypto/commons/math/torus/,
commons/numeric/) with a handful of dtype-parameterized helpers.

TPU notes: the v5e backend supports 64-bit integer ops (XLA emulates them with
32-bit pairs) but has no float64.  Everything here therefore avoids f64 on the
accelerator; float interchange uses a two-limb f32 path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# x64 must be enabled before any tracing; tfhe_tpu/__init__ does this at import.


def torus_dtype(log_q: int):
    if log_q == 64:
        return jnp.uint64
    if log_q == 32:
        return jnp.uint32
    raise ValueError(f"unsupported torus width {log_q}")


def signed_dtype(log_q: int):
    return jnp.int64 if log_q == 64 else jnp.int32


def to_signed(x, log_q: int):
    """Reinterpret torus element as signed representative in [-q/2, q/2)."""
    return x.astype(signed_dtype(log_q))


def from_signed(x, log_q: int):
    return x.astype(torus_dtype(log_q))


def encode_msg(msg, log_q: int, log_scale: int):
    """Encode an integer message as msg * 2^log_scale on the torus."""
    dt = torus_dtype(log_q)
    return (jnp.asarray(msg).astype(dt)) << dt(log_scale)


def round_decode(ct_value, log_q: int, log_scale: int):
    """Decode by rounding to the nearest multiple of 2^log_scale.

    Returns the integer message (mod 2^(log_q - log_scale)).
    """
    dt = torus_dtype(log_q)
    x = jnp.asarray(ct_value).astype(dt)
    half = dt(1) << dt(log_scale - 1)
    return (x + half) >> dt(log_scale)


def mod_switch(x, log_q: int, log_out: int):
    """Round a torus element to log_out bits: round(x * 2^log_out / q) mod 2^log_out.

    Mirrors `fast_pbs_modulus_switch` (reference fft_impl/common.rs:26-43):
    shift down keeping one guard bit, round half-up.
    """
    dt = torus_dtype(log_q)
    x = jnp.asarray(x).astype(dt)
    shift = log_q - log_out - 1
    return ((x >> dt(shift)) + dt(1)) >> dt(1)  # in [0, 2^log_out]


def torus_to_float(x, log_q: int):
    """Torus → float in [-0.5, 0.5) using the signed representative.

    Uses f64 where available (CPU tests); on TPU callers should prefer the
    integer paths — this is only used by encryption noise utilities.
    """
    s = to_signed(x, log_q)
    return s.astype(jnp.float64) / np.float64(2.0 ** log_q)


def float_round_to_torus(x, log_q: int):
    """Round a float (units of q, signed representative) to a torus element."""
    dt = torus_dtype(log_q)
    r = jnp.round(x)
    return r.astype(signed_dtype(log_q)).astype(dt)


# ---------------------------------------------------------------------------
# f32-safe conversion for accelerator-side noise sampling: value = n * std may
# reach ~2^50; f32->i64 conversion is unimplemented on this TPU backend, so
# split into 24-bit limbs through i32.
# ---------------------------------------------------------------------------

def f32_to_torus_rounded(x, log_q: int):
    dt = torus_dtype(log_q)
    sdt = signed_dtype(log_q)
    hi = jnp.floor(x / np.float32(1 << 24))
    lo = x - hi * np.float32(1 << 24)
    hi_i = hi.astype(jnp.int32).astype(sdt)
    lo_i = jnp.round(lo).astype(jnp.int32).astype(sdt)
    return ((hi_i << sdt(24)) + lo_i).astype(dt)


def multiply_by_small_signed(x, m, log_q: int):
    """x * m on the torus for small signed integer m (wrapping)."""
    dt = torus_dtype(log_q)
    return x * jnp.asarray(m).astype(signed_dtype(log_q)).astype(dt)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def is_power_of_two(x: int) -> bool:
    return x > 0 and (x & (x - 1)) == 0
