"""GSW ciphertexts — the PolynomialSize=1 specialization of GGSW.

Reference: entities/gsw_ciphertext.rs defines the container but leaves its
primitives unimplemented ("TODO actually implement primitives for the
GswCiphertext").  Here the entity is functional: constant encryption plus the
GSW ⊡ LWE external product (the scalar analogue of the GLWE external
product), so encrypted-bit × LWE selection works without polynomials.

Layout: data[..., l, n+1, n+1] — level-major; row r (< n) of level j is an
LWE encryption of -m·s_r·q/B^(j+1); the last row encrypts +m·q/B^(j+1)
(same body-encoded gadget convention as encrypt_constant_ggsw).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import rng
from ..decomposition import signed_decompose
from ..entities import GswCiphertext, LweCiphertext, LweSecretKey
from ..numeric import torus_dtype
from ..params import DecompParams
from .encryption import encrypt_lwe

__all__ = ["encrypt_constant_gsw", "gsw_external_product", "cmux_lwe"]


def encrypt_constant_gsw(key, sk: LweSecretKey, msg, decomp: DecompParams,
                         noise_std: float, log_q: int) -> GswCiphertext:
    """GSW of a small constant message under an LWE secret key.

    Mirrors encrypt_constant_ggsw (algorithms/ggsw_encryption.rs) with
    polynomial size 1: every gadget row is a fresh LWE encryption of the
    body-encoded plaintext, with deterministically forked noise streams.
    """
    dt = torus_dtype(log_q)
    n = sk.lwe_dimension
    levels = decomp.level
    keys = rng.split(key, levels * (n + 1))

    m = jnp.asarray(msg).astype(jnp.int64)
    lvl_factors = jnp.stack(
        [(m.astype(dt) * (dt(1) << dt(log_q - decomp.base_log * (l + 1))))
         for l in range(levels)])                            # [levels]
    s_bits = sk.bits.astype(jnp.int64)                       # [n]
    neg_ms = (-(lvl_factors[:, None].astype(jnp.uint64).astype(jnp.int64)
                * s_bits[None, :])).astype(dt)               # [levels, n]
    pts = jnp.concatenate([neg_ms, lvl_factors[:, None]], axis=1)  # [l, n+1]

    def enc(subkey, pt):
        return encrypt_lwe(subkey, sk, pt, noise_std, log_q).data

    rows = jax.vmap(enc)(keys, pts.reshape(levels * (n + 1)))
    return GswCiphertext(data=rows.reshape(levels, n + 1, n + 1),
                         decomp=decomp)


def gsw_external_product(gsw: GswCiphertext, ct: LweCiphertext,
                         log_q: int) -> LweCiphertext:
    """⟨G^{-1}(ct), GSW⟩ → LWE of m·pt: signed-decompose every coefficient
    of `ct` and contract the digit tensor against the gadget rows (wrapping
    mod 2^log_q).  Batched over ct's leading axes."""
    dt = torus_dtype(log_q)
    digits = signed_decompose(ct.data, gsw.decomp, log_q)    # [..., n+1, L]
    d = digits.astype(jnp.int64).astype(dt)                  # two's complement
    # out[..., c] = sum_{l, r} d[..., r, l] * gsw[l, r, c].  Elementwise
    # broadcast + sum, NOT dot_general: XLA's X64 rewriting has no u64 dot,
    # and wide-integer contractions stay off the MXU anyway.
    rows = jnp.moveaxis(gsw.data.astype(dt), 0, 1)           # [n+1, L, n+1]
    out = jnp.sum(d[..., :, :, None] * rows, axis=(-3, -2))
    return LweCiphertext(data=out)


def cmux_lwe(gsw: GswCiphertext, ct0: LweCiphertext, ct1: LweCiphertext,
             log_q: int) -> LweCiphertext:
    """ct0 + GSW(b) ⊡ (ct1 - ct0) — selects ct1 when the encrypted bit is 1."""
    diff = LweCiphertext(data=ct1.data - ct0.data)
    sel = gsw_external_product(gsw, diff, log_q)
    return LweCiphertext(data=ct0.data + sel.data)
