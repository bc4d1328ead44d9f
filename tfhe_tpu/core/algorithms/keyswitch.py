"""LWE keyswitching (and packing keyswitch to GLWE).

Reference hot loop 2: `keyswitch_lwe_ciphertext`
(algorithms/lwe_keyswitch.rs:96-170) — per-mask-element signed decomposition
followed by a fused multiply-subtract over KSK rows.  TPU re-design: the
whole batch decomposes at once, and the (input index, level) contraction is
an int8 matrix multiplication on the MXU: the signed digits fit int8
directly (|d| <= 2^{B-1}, B <= 8 on every named set), the KSK torus words
split into byte limbs fed as (byte - 128) with a data-sum correction, and
the log_q/8 limb dots recombine with wrapping shifts — exact mod 2^log_q.
A u64 elementwise fallback covers base_log > 8.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..decomposition import signed_decompose
from ..entities import (GlweCiphertext, LweCiphertext, LweKeyswitchKey,
                        LwePackingKeyswitchKey)
from ..numeric import torus_dtype


def _neg_digit_mac_chunked(digits, key_data, log_q: int, chunk: int = 256):
    """u64 elementwise fallback, chunked over n_in to bound the buffer."""
    dt = torus_dtype(log_q)
    n_in = key_data.shape[0]
    tail = key_data.shape[2:]
    batch = digits.shape[:-2]
    acc = jnp.zeros(batch + tail, dtype=dt)
    tail_axes = (None,) * len(tail)
    for start in range(0, n_in, chunk):
        end = min(start + chunk, n_in)
        d = digits[..., start:end, :].astype(dt)             # [..., C, l]
        k = key_data[start:end]                              # [C, l, *tail]
        prod = d[(...,) + tail_axes] * k                     # [..., C, l, *tail]
        acc = acc + prod.sum(axis=tuple(range(len(batch), len(batch) + 2)))
    return acc


def _neg_digit_mac(digits, key_data, log_q: int, base_log: int = 99):
    """Σ_{i,l} d_{i,l} * K[i,l,...] with wrapping torus arithmetic.

    digits: [..., n_in, l] int; key_data: [n_in, l, *tail] torus.
    Returns [..., *tail]."""
    if base_log > 8 or log_q % 8 or digits.ndim < 2:
        return _neg_digit_mac_chunked(digits, key_data, log_q)
    dt = torus_dtype(log_q)
    n_in, levels = key_data.shape[0], key_data.shape[1]
    tail = key_data.shape[2:]
    batch = digits.shape[:-2]
    K = n_in * levels
    d8 = digits.reshape(batch + (K,)).astype(jnp.int8)
    # offset correction: feeding (byte - 128) drops 128 * sum(d) per limb
    dsum = digits.sum(axis=(-2, -1)).astype(jnp.int64)[..., None]   # [..., 1]
    kb = key_data.reshape(K, -1)                                    # [K, M]
    acc = None
    for k in range(log_q // 8):
        limb = (((kb >> dt(8 * k)) & dt(255)).astype(jnp.int32) - 128
                ).astype(jnp.int8)
        s = jax.lax.dot_general(d8, limb, (((d8.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)   # [..., M]
        t = (s.astype(jnp.int64) + 128 * dsum).astype(dt) << dt(8 * k)
        acc = t if acc is None else acc + t
    return acc.reshape(batch + tail)


def keyswitch_lwe(ct: LweCiphertext, ksk: LweKeyswitchKey, log_q: int) -> LweCiphertext:
    """LWE(n_in) → LWE(n_out): out = (0, b) - Σ_{i,l} d_{i,l}·KSK[i,l]."""
    dt = torus_dtype(log_q)
    digits = signed_decompose(ct.mask, ksk.decomp, log_q)    # [..., n_in, l]
    acc = _neg_digit_mac(digits, ksk.data, log_q,
                         base_log=ksk.decomp.base_log)       # [..., n_out+1]
    out = -acc
    out = out.at[..., -1].add(ct.body)
    return LweCiphertext(data=out)


def packing_keyswitch_lwe_to_glwe(ct: LweCiphertext, pksk: LwePackingKeyswitchKey,
                                  log_q: int) -> GlweCiphertext:
    """Pack one LWE into a (constant-coefficient) GLWE
    (reference keyswitch_lwe_ciphertext_into_glwe_ciphertext,
    algorithms/lwe_packing_keyswitch.rs:102)."""
    digits = signed_decompose(ct.mask, pksk.decomp, log_q)   # [..., n_in, l]
    acc = _neg_digit_mac(digits, pksk.data, log_q,
                         base_log=pksk.decomp.base_log)      # [..., k+1, N]
    out = -acc
    out = out.at[..., -1, 0].add(ct.body)
    return GlweCiphertext(data=out)


def packing_keyswitch_lwe_list_to_glwe(cts: LweCiphertext,
                                       pksk: LwePackingKeyswitchKey,
                                       log_q: int) -> GlweCiphertext:
    """Pack a list of m ≤ N LWEs into one GLWE with messages at coefficients
    0..m-1: Σ_i X^i · KS(ct_i).  cts.data: [..., m, n_in+1]."""
    glwe = packing_keyswitch_lwe_to_glwe(
        LweCiphertext(data=cts.data), pksk, log_q)           # [..., m, k+1, N]
    m = cts.data.shape[-2]
    n = pksk.polynomial_size
    data = glwe.data
    shifted = jax.vmap(lambda d, i: _static_monomial_mul(d, i),
                       in_axes=(-3, 0), out_axes=-3)(data, jnp.arange(m))
    return GlweCiphertext(data=shifted.sum(axis=-3))


def _static_monomial_mul(polys, t):
    """X^t · polys for non-negative t < N (traced), via roll + sign mask."""
    n = polys.shape[-1]
    idx = jnp.arange(n)
    src = (idx - t) % n
    rolled = polys[..., src]
    return jnp.where(idx < t, -rolled, rolled)
