"""LWE/GLWE linear algebra (reference algorithms/lwe_linear_algebra.rs,
glwe_linear_algebra.rs, slice_algorithms.rs) — trivial on batched unsigned
arrays thanks to wrapping semantics."""
from __future__ import annotations

import jax.numpy as jnp

from ..entities import GlweCiphertext, LweCiphertext
from ..numeric import torus_dtype


def lwe_add(a: LweCiphertext, b: LweCiphertext) -> LweCiphertext:
    return LweCiphertext(data=a.data + b.data)


def lwe_sub(a: LweCiphertext, b: LweCiphertext) -> LweCiphertext:
    return LweCiphertext(data=a.data - b.data)


def lwe_neg(a: LweCiphertext) -> LweCiphertext:
    return LweCiphertext(data=-a.data)


def lwe_add_plaintext(a: LweCiphertext, pt) -> LweCiphertext:
    data = a.data.at[..., -1].add(jnp.asarray(pt).astype(a.data.dtype))
    return LweCiphertext(data=data)


def lwe_sub_plaintext(a: LweCiphertext, pt) -> LweCiphertext:
    data = a.data.at[..., -1].add(-jnp.asarray(pt).astype(a.data.dtype))
    return LweCiphertext(data=data)


def lwe_mul_cleartext(a: LweCiphertext, c) -> LweCiphertext:
    dt = a.data.dtype
    return LweCiphertext(data=a.data * jnp.asarray(c).astype(dt))


def glwe_add(a: GlweCiphertext, b: GlweCiphertext) -> GlweCiphertext:
    return GlweCiphertext(data=a.data + b.data)


def glwe_sub(a: GlweCiphertext, b: GlweCiphertext) -> GlweCiphertext:
    return GlweCiphertext(data=a.data - b.data)


def glwe_add_plaintext_poly(a: GlweCiphertext, poly) -> GlweCiphertext:
    data = a.data.at[..., -1, :].add(jnp.asarray(poly).astype(a.data.dtype))
    return GlweCiphertext(data=data)
