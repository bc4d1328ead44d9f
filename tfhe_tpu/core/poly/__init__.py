"""Polynomial algebra over Z_q[X]/(X^N + 1).

Re-designs the reference's `polynomial_algorithms.rs` for batched arrays:
the rotation primitive (monic monomial mul/div, reference
algorithms/polynomial_algorithms.rs:219-375) is expressed as a roll + sign
mask (no gathers), and products go through the exact CRT-NTT engine in
`ntt.py` instead of Karatsuba/FFT.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import ntt
from .ntt import (NttPlan, garner_to_torus, get_plan, negacyclic_polymul,
                  ntt_forward, ntt_forward_digits, ntt_inverse, pointwise_mac,
                  pointwise_mul, required_num_primes)

__all__ = [
    "ntt", "NttPlan", "get_plan", "negacyclic_polymul", "ntt_forward",
    "ntt_forward_digits", "ntt_inverse", "pointwise_mac", "pointwise_mul",
    "garner_to_torus", "required_num_primes",
    "monomial_mul", "polynomial_list_monomial_mul",
]


def monomial_mul(poly, t):
    """X^t * poly  mod X^N + 1, for traced integer t ∈ [0, 2N).

    poly: [..., N]; t: scalar or batch-shaped [...] (broadcast against the
    leading axes).  Negacyclic wrap-around flips signs: implemented as a
    (traced-shift) roll plus a sign mask built from iota comparisons — no
    gather, TPU/VPU friendly.
    """
    n = poly.shape[-1]
    t = jnp.asarray(t)
    t_red = t % (2 * n)
    flip = (t_red >= n)                      # X^N = -1
    rot = jnp.where(flip, t_red - n, t_red)  # in [0, N)
    # roll right by rot: out[j] = poly[(j - rot) mod N]
    idx = jnp.arange(n)
    shifted = _roll_right(poly, rot)
    sign_neg = (idx < rot[..., None]) ^ flip[..., None]
    return jnp.where(sign_neg, -shifted, shifted)


def _roll_right(poly, rot):
    """Right-roll last axis by per-batch traced amounts rot ∈ [0, N)."""
    n = poly.shape[-1]
    idx = jnp.arange(n)
    batch = jnp.broadcast_shapes(poly.shape[:-1], rot.shape)
    src = jnp.broadcast_to((idx - rot[..., None]) % n, batch + (n,))
    poly_b = jnp.broadcast_to(poly, batch + (n,))
    return jnp.take_along_axis(poly_b, src, axis=-1)


def polynomial_list_monomial_mul(polys, t):
    """Apply monomial_mul with one t per batch element to a list of polys:
    polys [..., R, N], t [...]."""
    return monomial_mul(polys, t[..., None])
