"""Programmable bootstrapping: external product, CMUX, blind rotation,
sample extraction, and the PBS driver.

Re-design of the reference's hottest path (fft_impl/fft64/crypto/ggsw.rs:477
`add_external_product_assign`, fft64/crypto/bootstrap.rs:243
`blind_rotate_assign`, algorithms/lwe_programmable_bootstrapping.rs:1017,
algorithms/glwe_sample_extraction.rs:91) for batched TPU execution:

  * the unit of work is a *batch* of LWE ciphertexts [B, n+1] sharing one
    bootstrap key — batch is the TPU-parallel axis;
  * the blind-rotation loop over mask elements is a `lax.fori_loop` with the
    NTT-domain BSK slice dynamically indexed per step;
  * decompose → NTT → MAC → iNTT is exact CRT-NTT arithmetic (see poly/ntt.py),
    so unlike the reference's f64 FFT it adds zero rounding noise;
  * rotations by encrypted-derived amounts are roll+sign-mask gathers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..decomposition import signed_decompose
from ..entities import GlweCiphertext, LweCiphertext, NttLweBootstrapKey
from ..numeric import torus_dtype
from ..params import CommonPBSParams, DecompParams
from ..poly import (garner_to_torus, get_plan, monomial_mul,
                    ntt_forward_digits, ntt_inverse, pointwise_mac,
                    required_num_primes)


def external_product_num_primes(n: int, glwe_size: int, decomp: DecompParams,
                                log_q: int) -> int:
    """CRT width for the external-product MAC: per output coefficient the
    integer convolution value is bounded by N * J * B/2 * 2^log_q."""
    j = decomp.level * glwe_size
    log_bound = np.log2(n) + np.log2(j) + (decomp.base_log - 1) + log_q
    return required_num_primes(log_bound)


def modulus_switch(x, log_q: int, polynomial_size: int):
    """Torus → Z_{2N} rounding (reference fast_pbs_modulus_switch,
    fft_impl/common.rs:26-43)."""
    log_2n = int(np.log2(polynomial_size)) + 1
    dt = x.dtype.type
    shift = log_q - log_2n - 1
    return (((x >> dt(shift)) + dt(1)) >> dt(1)).astype(jnp.int32)  # [0, 2N]


def external_product_accumulate(acc_data, operand_data, bsk_slice,
                                decomp: DecompParams, log_q: int,
                                bsk_shoup=None):
    """acc += GGSW ⊡ operand.

    acc_data, operand_data: [..., k+1, N] torus; bsk_slice: NTT-domain GGSW
    [P, l*(k+1), k+1, N] uint32 (+ its Shoup twin for the division-free MAC).
    Returns updated acc_data."""
    n = acc_data.shape[-1]
    glwe_size = acc_data.shape[-2]
    num_primes = bsk_slice.shape[-4]
    plan = get_plan(n, num_primes)

    digits = signed_decompose(operand_data, decomp, log_q)   # [..., k+1, N, l]
    digits = jnp.moveaxis(digits, -1, -3)                    # [..., l, k+1, N]
    digits = digits.reshape(*digits.shape[:-3], decomp.level * glwe_size, n)
    d_hat = ntt_forward_digits(plan, digits)                 # [..., J, P, N]
    d_hat = jnp.moveaxis(d_hat, -2, -3)                      # [..., P, J, N]
    prod = pointwise_mac(plan, d_hat, bsk_slice, bsk_shoup)  # [..., P, R, N]
    prod = jnp.moveaxis(prod, -3, -2)                        # [..., R, P, N]
    delta = garner_to_torus(plan, ntt_inverse(plan, prod), log_q)    # [..., R, N]
    return acc_data + delta


def cmux(ct0: GlweCiphertext, ct1: GlweCiphertext, bsk_slice,
         decomp: DecompParams, log_q: int) -> GlweCiphertext:
    """ct0 + GGSW(b) ⊡ (ct1 - ct0): selects ct1 when b = 1
    (reference fft64/crypto/ggsw.rs:766)."""
    diff = ct1.data - ct0.data
    return GlweCiphertext(data=external_product_accumulate(
        ct0.data, diff, bsk_slice, decomp, log_q))


def blind_rotate(lut: GlweCiphertext, lwe: LweCiphertext,
                 bsk: NttLweBootstrapKey, log_q: int) -> GlweCiphertext:
    """Rotate the LUT accumulator by the (mod-switched) phase of `lwe`.

    lut: [k+1, N] or [B, k+1, N]; lwe: [B, n+1].  The per-mask-element
    rotate-subtract + external product is the reference's HOT LOOP 1
    (fft64/crypto/bootstrap.rs:283-324); here each step processes the whole
    batch at once.
    """
    n_poly = bsk.polynomial_size
    decomp = bsk.decomp
    n_in = bsk.input_lwe_dimension
    batch_shape = lwe.data.shape[:-1]

    switched = modulus_switch(lwe.data, log_q, n_poly)       # [B, n+1] in [0,2N]
    a_sw, b_sw = switched[..., :-1], switched[..., -1]

    # acc = X^{-b̃} * lut  (monomial division = multiplication by X^{2N - b̃})
    acc = monomial_mul(
        jnp.broadcast_to(lut.data, batch_shape + lut.data.shape[-2:]),
        (2 * n_poly - b_sw)[..., None])

    def step(j, acc):
        aj = a_sw[..., j]                                   # [B]
        rotated = monomial_mul(acc, aj[..., None])          # X^{ã_j}·acc
        diff = rotated - acc
        bsk_j = jax.lax.dynamic_index_in_dim(bsk.data, j, axis=0, keepdims=False)
        shoup_j = (None if bsk.shoup is None else
                   jax.lax.dynamic_index_in_dim(bsk.shoup, j, axis=0, keepdims=False))
        return external_product_accumulate(acc, diff, bsk_j, decomp, log_q,
                                           bsk_shoup=shoup_j)

    acc = jax.lax.fori_loop(0, n_in, step, acc)
    return GlweCiphertext(data=acc)


def sample_extract(glwe: GlweCiphertext, index: int = 0) -> LweCiphertext:
    """Extract coefficient `index` as an LWE ciphertext under the flattened
    GLWE key (reference extract_lwe_sample_from_glwe_ciphertext,
    algorithms/glwe_sample_extraction.rs:91).

    a_{i*N + j} = mask_i[index - j]  for j ≤ index,  -mask_i[N + index - j]
    for j > index; body = body_poly[index].
    """
    n = glwe.polynomial_size
    mask = glwe.mask                                         # [..., k, N]
    j = jnp.arange(n)
    src = (index - j) % n
    sign_neg = j > index
    rows = mask[..., :, src]                                 # [..., k, N]
    rows = jnp.where(sign_neg, -rows, rows)
    flat = rows.reshape(*rows.shape[:-2], -1)                # [..., k*N]
    body = glwe.body[..., index]
    return LweCiphertext(data=jnp.concatenate([flat, body[..., None]], axis=-1))


def programmable_bootstrap(lwe: LweCiphertext, lut: GlweCiphertext,
                           bsk: NttLweBootstrapKey, log_q: int) -> LweCiphertext:
    """Full PBS: mod-switch → blind rotate → sample extract coefficient 0
    (reference programmable_bootstrap_lwe_ciphertext,
    algorithms/lwe_programmable_bootstrapping.rs:1017).

    Uses the fused Pallas step kernel when enabled (config.use_pallas_pbs)
    and the key carries its paired form; otherwise the XLA path."""
    from ... import config
    if config.use_pallas_pbs() and bsk.paired is not None:
        import os
        from ..poly.pallas_ntt import blind_rotate_fused, blind_rotate_pallas
        block_b = int(os.environ.get("TFHE_TPU_PALLAS_BLOCK", "8"))
        interp = config.pallas_interpret()
        if config.use_fused_rotation() and bsk.paired_order == "fourstep":
            rotated = GlweCiphertext(data=blind_rotate_fused(
                lut.data, lwe.data, bsk.paired, bsk.paired_shoup,
                bsk.mono, bsk.mono_shoup, bsk.decomp, log_q=log_q,
                block_b=block_b, mode="delta", interpret=interp))
            return sample_extract(rotated, 0)
        rotated = GlweCiphertext(data=blind_rotate_pallas(
            lut.data, lwe.data, bsk.paired, bsk.paired_shoup, bsk.decomp,
            log_q=log_q, block_b=block_b,
            mxu=bsk.paired_order.startswith("fourstep"),
            lanes=(bsk.paired_order == "fourstep-lanes"),
            mono_tab=bsk.mono, mono_sh=bsk.mono_shoup, interpret=interp))
        return sample_extract(rotated, 0)
    rotated = blind_rotate(lut, lwe, bsk, log_q)
    return sample_extract(rotated, 0)


def blind_rotate_only(lwe: LweCiphertext, lut: GlweCiphertext,
                      bsk: NttLweBootstrapKey, log_q: int) -> GlweCiphertext:
    """PBS without sample extraction (fork addition used by the gadget MVB
    path: programmable_bootstrap_lwe_ciphertext_without_sample_extract,
    reference gadget/engine/bootstrapping.rs:433)."""
    return blind_rotate(lut, lwe, bsk, log_q)
