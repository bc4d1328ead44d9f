"""GLWE × GLWE multiplication with relinearization (fork feature).

Reference: tfhe/src/core_crypto/algorithms/custom_glwe_glwe_product.rs
(glwe_mult :13, modswitch :75-132, glwe_ciphertext_mult_core :134-322) and
custom_relinearization_key_generation.rs.

Pipeline: mod-switch both operands down by (32 - log_p/2) bits → tensor
product over Z_q[X]/(X^N+1) (exact CRT-NTT here instead of Karatsuba) →
gadget-decompose the s_i·s_j cofactor polynomials and MAC them against the
relinearization key.  RLK block n ↔ key-poly pair (i, j≤i) with
n = i(i+1)/2 + j; each block holds `level` GLWE encryptions of
s_i·s_j · q/B^(l+1) (level axis index l ↔ weight q/B^(l+1), matching every
other key layout in this framework).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import rng
from ..decomposition import signed_decompose
from ..entities import GlweCiphertext, GlweRelinearizationKey, GlweSecretKey
from ..params import DecompParams
from ..poly import negacyclic_polymul
from .encryption import encrypt_glwe


def pair_index(i: int, j: int) -> int:
    """n = T_i + j for j <= i."""
    return i * (i + 1) // 2 + j


def generate_relinearization_key(key, glwe_sk: GlweSecretKey,
                                 decomp: DecompParams, noise_std: float,
                                 log_q: int = 64) -> GlweRelinearizationKey:
    k = glwe_sk.glwe_dimension
    n = glwe_sk.polynomial_size
    dt = jnp.uint64
    blocks = []
    bits = glwe_sk.bits.astype(jnp.int64)
    for i in range(k):
        for j in range(i + 1):
            prod = negacyclic_polymul(bits[i], bits[j], log_q,
                                      log_bound=np.log2(n) + 2)      # s_i*s_j
            pts = jnp.stack([
                prod.astype(dt) * (dt(1) << dt(log_q - decomp.base_log * (l + 1)))
                for l in range(decomp.level)])                        # [l, N]
            sub = rng.fork(key, pair_index(i, j))
            blocks.append(encrypt_glwe(sub, glwe_sk, pts, noise_std, log_q).data)
    return GlweRelinearizationKey(data=jnp.stack(blocks), decomp=decomp)


def glwe_mult(lhs: GlweCiphertext, rhs: GlweCiphertext,
              rlk: GlweRelinearizationKey, log_p: int,
              log_q: int = 64) -> GlweCiphertext:
    """Exact re-design of reference `glwe_mult` (power-of-two encodings,
    log_p even): returns GLWE(m1*m2) at scale q/2^log_p."""
    assert log_p % 2 == 0, "log_p must be even (reference assert)"
    shift = 32 - log_p // 2
    a = lhs.data >> jnp.uint64(shift)
    b = rhs.data >> jnp.uint64(shift)
    k = lhs.glwe_dimension
    n = lhs.polynomial_size
    # operands are < 2^(64-shift): exact product bound for the NTT
    op_bits = 64 - shift
    pair_bound = 2 * op_bits + np.log2(n) + 1

    def mul(x, y):
        return negacyclic_polymul(x, y, log_q, log_bound=pair_bound)

    a_mask, a_body = a[..., :k, :], a[..., k, :]
    b_mask, b_body = b[..., :k, :], b[..., k, :]

    # t_i = a1_i*a2_i ; r'_{i,j} = a1_i*a2_j + a1_j*a2_i (j<i)
    # a'_i = a1_i*b2 + a2_i*b1 ; b' = b1*b2
    out_mask = jnp.stack([mul(a_mask[..., i, :], b_body) + mul(b_mask[..., i, :], a_body)
                          for i in range(k)], axis=-2)
    out_body = mul(a_body, b_body)

    decomp = rlk.decomp
    out = jnp.concatenate([out_mask, out_body[..., None, :]], axis=-2)
    for i in range(k):
        for j in range(i + 1):
            if i == j:
                cof = mul(a_mask[..., i, :], b_mask[..., i, :])
            else:
                cof = (mul(a_mask[..., i, :], b_mask[..., j, :])
                       + mul(a_mask[..., j, :], b_mask[..., i, :]))
            digits = signed_decompose(cof, decomp, log_q)     # [..., N, l]
            block = rlk.data[pair_index(i, j)]                # [l, k+1, N]
            for l in range(decomp.level):
                d = digits[..., l]                            # [..., N]
                contrib = negacyclic_polymul(
                    d[..., None, :], block[l], log_q,
                    log_bound=(decomp.base_log - 1) + log_q + np.log2(n) + 1)
                out = out + contrib
    return GlweCiphertext(data=out)
