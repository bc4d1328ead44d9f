"""WoP-PBS (without-padding programmable bootstrapping): bit extraction,
circuit bootstrapping, CMux-tree vertical packing.

Reference: fft_impl/fft64/crypto/wop_pbs/mod.rs (extract_bits :66,
homomorphic_shift_boolean :370, circuit_bootstrap_boolean :243,
cmux_tree_memory_optimized :468, blind_rotate_assign :866,
vertical_packing :785) and algorithms/lwe_private_functional_packing_keyswitch.rs.

All functions are batched over leading axes; GGSW lists are ordered MSB
first (reference convention).
"""
from __future__ import annotations

from typing import List

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np

from .. import rng
from ..decomposition import signed_decompose
from ..entities import (GgswCiphertext, GlweCiphertext, GlweSecretKey,
                        LweCiphertext, LweKeyswitchKey, LweSecretKey,
                        NttLweBootstrapKey)
from ..params import DecompParams
from ..poly import (garner_to_torus, get_plan, ntt_forward, ntt_forward_digits,
                    ntt_inverse, pointwise_mac)
from .bootstrap import external_product_num_primes, programmable_bootstrap
from .encryption import encrypt_glwe, trivial_glwe
from .keyswitch import _neg_digit_mac, keyswitch_lwe

LOG_Q = 64
U64 = jnp.uint64


# ---------------------------------------------------------------------------
# private functional packing keyswitch (PFPKS)
# ---------------------------------------------------------------------------


@struct.dataclass
class CbsPfpkskList:
    """One PFPKSK per output GGSW row r: packs LWE(m) into GLWE(m * v_r(X))
    with v_r = -s_r for r < k, v_k = 1 (reference
    LwePrivateFunctionalPackingKeyswitchKeyList for circuit bootstrap).

    data [k+1, n_in+1, l, k+1, N]: per row key, per input position (mask
    positions then body), per level, a GLWE encryption of:
      i < n_in:  s_in[i] * v_r(X) * q/B^(l+1)
      i = n_in:  v_r(X) * q/B^(l+1)
    """

    data: jnp.ndarray
    decomp: DecompParams = struct.field(pytree_node=False, default=None)


def generate_cbs_pfpksk(key, big_sk: LweSecretKey, glwe_sk: GlweSecretKey,
                        decomp: DecompParams, noise_std: float,
                        log_q: int = LOG_Q) -> CbsPfpkskList:
    k, n_poly = glwe_sk.glwe_dimension, glwe_sk.polynomial_size
    n_in = big_sk.lwe_dimension
    levels = decomp.level
    s_in = big_sk.bits.astype(jnp.int64)                  # [n_in]
    rows = []
    for r in range(k + 1):
        if r < k:
            v = (-glwe_sk.bits[r].astype(jnp.int64))      # [N]
        else:
            v = jnp.zeros((n_poly,), jnp.int64).at[0].set(1)
        g = jnp.stack([U64(1) << U64(log_q - decomp.base_log * (l + 1))
                       for l in range(levels)])           # [l]
        # plaintexts [n_in+1, l, N]
        coeff = jnp.concatenate([s_in, jnp.ones((1,), jnp.int64)])  # [n_in+1]
        pts = (coeff[:, None, None] * v[None, None, :]).astype(U64) \
            * g[None, :, None]
        sub = rng.fork(key, r)
        ct = encrypt_glwe(sub, glwe_sk, pts, noise_std, log_q)
        rows.append(ct.data)                              # [n_in+1, l, k+1, N]
    return CbsPfpkskList(data=jnp.stack(rows), decomp=decomp)


def private_functional_keyswitch(ct: LweCiphertext, pfpksk_row,
                                 decomp: DecompParams,
                                 log_q: int = LOG_Q) -> GlweCiphertext:
    """LWE(m) → GLWE(m·v(X)) for one row key [n_in+1, l, k+1, N]
    (reference private_functional_keyswitch_lwe_ciphertext_into_glwe_ciphertext).

    out = Σ_l d_l(b)·K[n] - Σ_{i,l} d_l(a_i)·K[i]; we fold the sign into the
    digits and use the shared chunked MAC."""
    digits = signed_decompose(ct.data, decomp, log_q)     # [..., n_in+1, l]
    digits = digits.at[..., :-1, :].multiply(-1)          # negate mask digits
    acc = _neg_digit_mac(digits, pfpksk_row, log_q)       # Σ (±d)·K
    return GlweCiphertext(data=acc)


# ---------------------------------------------------------------------------
# bit extraction (reference extract_bits, wop_pbs/mod.rs:66-231)
# ---------------------------------------------------------------------------


def extract_bits(lwe_in: LweCiphertext, ksk: LweKeyswitchKey,
                 bsk: NttLweBootstrapKey, delta_log: int,
                 num_bits: int, log_q: int = LOG_Q) -> LweCiphertext:
    """Extract `num_bits` bits starting at bit `delta_log` of the plaintext.

    Returns LweCiphertext [..., num_bits, n_small+1]: bit i is the
    (delta_log + num_bits - 1 - i)-th plaintext bit (MSB first), each
    encrypted at scale 2^63 under the small key."""
    n_poly = bsk.polynomial_size
    k = bsk.glwe_size - 1
    state = lwe_in.data
    outs = []
    for bit_idx in range(num_bits):
        shift = log_q - delta_log - bit_idx - 1
        shifted = state << U64(shift)                     # bit to the MSB
        ks = keyswitch_lwe(LweCiphertext(data=shifted), ksk, log_q)
        outs.append(ks.data)
        if bit_idx == num_bits - 1:
            break
        # center the error for the negacyclic sign LUT
        ks_c = ks.data.at[..., -1].add(U64(1) << U64(log_q - 2))
        # LUT with every coefficient = -2^(delta_log - 1 + bit_idx)
        alpha = U64(1) << U64(delta_log - 1 + bit_idx)
        body = jnp.full((n_poly,), U64(0) - alpha, dtype=U64)
        acc = trivial_glwe(body, k, log_q)
        pbs = programmable_bootstrap(LweCiphertext(data=ks_c), acc, bsk, log_q)
        # pbs + alpha encrypts bit * 2^(delta_log + bit_idx): subtract it to
        # clear the extracted bit from the running value
        pbs_data = pbs.data.at[..., -1].add(alpha)
        state = state - pbs_data
    # MSB first (reference stores extracted bits in reverse)
    return LweCiphertext(data=jnp.stack(outs[::-1], axis=-2))


# ---------------------------------------------------------------------------
# circuit bootstrap (reference circuit_bootstrap_boolean, wop_pbs/mod.rs:243)
# ---------------------------------------------------------------------------


def homomorphic_shift_boolean(bsk: NttLweBootstrapKey, lwe_in: LweCiphertext,
                              level: int, cbs_base_log: int, delta_log: int,
                              log_q: int = LOG_Q) -> LweCiphertext:
    """LWE(bit·2^delta_log) → LWE(bit·2^(q - base·level)) via one negacyclic
    PBS (reference homomorphic_shift_boolean, wop_pbs/mod.rs:370)."""
    n_poly = bsk.polynomial_size
    k = bsk.glwe_size - 1
    data = lwe_in.data * (U64(1) << U64(log_q - delta_log - 1))
    data = data.at[..., -1].add(U64(1) << U64(log_q - 2))
    alpha = U64(1) << U64(log_q - 1 - cbs_base_log * level)
    body = jnp.full((n_poly,), U64(0) - alpha, dtype=U64)
    acc = trivial_glwe(body, k, log_q)
    out = programmable_bootstrap(LweCiphertext(data=data), acc, bsk, log_q)
    return LweCiphertext(data=out.data.at[..., -1].add(alpha))


def circuit_bootstrap_boolean(bsk: NttLweBootstrapKey, lwe_in: LweCiphertext,
                              pfpksk: CbsPfpkskList, cbs_decomp: DecompParams,
                              delta_log: int, log_q: int = LOG_Q) -> GgswCiphertext:
    """LWE(bit·2^delta_log) → GGSW(bit): per level one PBS, per row one
    PFPKS.  Output data [..., l_cbs, k+1, k+1, N]."""
    glwe_size = pfpksk.data.shape[0]
    levels = []
    for lvl in range(1, cbs_decomp.level + 1):
        shifted = homomorphic_shift_boolean(bsk, lwe_in, lvl,
                                            cbs_decomp.base_log, delta_log, log_q)
        rows = []
        for r in range(glwe_size):
            glwe = private_functional_keyswitch(shifted, pfpksk.data[r],
                                                pfpksk.decomp, log_q)
            rows.append(glwe.data)                        # [..., k+1, N]
        levels.append(jnp.stack(rows, axis=-3))           # [..., row, comp, N]
    return GgswCiphertext(data=jnp.stack(levels, axis=-4), decomp=cbs_decomp)


def ggsw_to_ntt(ggsw: GgswCiphertext, log_q: int = LOG_Q):
    """Standard → NTT-domain GGSW for the CMux/vertical-packing path.
    Returns (data_hat [..., P, J, R, N], shoup twin)."""
    *lead, levels, glwe_size, _, n = ggsw.data.shape
    npr = external_product_num_primes(n, glwe_size, ggsw.decomp, log_q)
    plan = get_plan(n, npr)
    hat = ntt_forward(plan, ggsw.data)        # [..., l, row, comp, P, N]
    hat = jnp.moveaxis(hat, -2, -5)           # [..., P, l, row, comp, N]
    hat = hat.reshape(*lead, npr, levels * glwe_size, glwe_size, n)
    p64 = jnp.asarray(plan.p64[:, None, None, :])
    sh = (hat << U64(32)) // p64
    return hat, sh


def cmux_ntt(ct0: GlweCiphertext, ct1: GlweCiphertext, ggsw_hat, ggsw_shoup,
             decomp: DecompParams, log_q: int = LOG_Q) -> GlweCiphertext:
    from .bootstrap import external_product_accumulate
    diff = ct1.data - ct0.data
    return GlweCiphertext(data=external_product_accumulate(
        ct0.data, diff, ggsw_hat, decomp, log_q, bsk_shoup=ggsw_shoup))


def _monomial_div_static(polys, degree: int):
    """X^{-degree} * polys for a static degree (negacyclic)."""
    n = polys.shape[-1]
    idx = jnp.arange(n)
    src = (idx + degree) % n
    rolled = polys[..., src]
    flip = ((idx + degree) // n) % 2 == 1
    return jnp.where(flip, -rolled, rolled)


def vertical_packing(lut_polys, ggsw_hats: List, ggsw_shoups: List,
                     decomp: DecompParams, glwe_dimension: int,
                     log_q: int = LOG_Q) -> LweCiphertext:
    """Evaluate a big LUT over the bits held in `ggsw_hats` (MSB first).

    lut_polys: [2^t, N] clear LUT polynomials (t = len(ggsw) - log-usable in
    blind rotation); CMux tree consumes the t MSB GGSWs, the remaining run a
    GGSW-driven blind rotation, then coefficient 0 is sample extracted
    (reference vertical_packing, wop_pbs/mod.rs:785)."""
    from .bootstrap import sample_extract
    nb = len(ggsw_hats)
    num_lut = lut_polys.shape[0]
    log_lut = int(np.log2(num_lut)) if num_lut > 1 else 0
    assert num_lut == 1 << log_lut
    cmux_count = min(log_lut, nb)

    # CMux tree over the cmux_count most-significant GGSWs
    layers = [trivial_glwe(lut_polys[i], glwe_dimension, log_q)
              for i in range(num_lut)]
    for d in range(cmux_count):
        # ggsw index: the tree consumes MSB GGSWs; deepest layer uses the
        # LAST of the cmux group (LSB of the group) first
        g_idx = cmux_count - 1 - d
        nxt = []
        for i in range(0, len(layers), 2):
            nxt.append(cmux_ntt(layers[i], layers[i + 1],
                                ggsw_hats[g_idx], ggsw_shoups[g_idx],
                                decomp, log_q))
        layers = nxt
    acc = layers[0]

    # blind rotation over the remaining (LSB) GGSWs
    br = list(range(cmux_count, nb))
    monomial = 1
    for g_idx in reversed(br):
        rotated = GlweCiphertext(data=_monomial_div_static(acc.data, monomial))
        acc = cmux_ntt(acc, rotated, ggsw_hats[g_idx], ggsw_shoups[g_idx],
                       decomp, log_q)
        monomial <<= 1
    return sample_extract(acc, 0)
