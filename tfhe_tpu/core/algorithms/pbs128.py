"""Programmable bootstrapping at a 2^128 ciphertext modulus.

The reference reaches a u128 modulus through a dedicated f128 FFT backend
(fft_impl/fft128/crypto/bootstrap.rs, lwe_programmable_bootstrapping.rs
`programmable_bootstrap_f128_lwe_ciphertext`) because f64 FFT precision
cannot carry 128-bit torus values.  Here the exact CRT-NTT generalizes
directly: the same digit transforms and MAC run over a wider prime set
(~150-210 bits of CRT range), and only the reduce/reconstruct ends change —
so the 128-bit path is *exact* too, with zero rounding noise.

Torus elements are two-limb `[..., 2]` u64 arrays (core/u128.py).  Entities
mirror the 64-bit layout with one extra trailing limb axis:

    Lwe128   data [..., n+1, 2]
    Glwe128  data [..., k+1, N, 2]
    BSK      NTT-domain [n, P, l*(k+1), k+1, N] u64  (same as 64-bit — CRT
             residues are modulus-agnostic once reduced)
"""
from __future__ import annotations

from typing import Any

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np

from .. import rng, u128
from ..decomposition import signed_decompose128
from ..params import DecompParams
from ..poly import get_plan, ntt_forward_digits, ntt_inverse, pointwise_mac
from ..poly.ntt import (garner_to_torus128, negacyclic_polymul128,
                        ntt_forward128, required_num_primes)

U64 = jnp.uint64


def _static(**kw):
    return struct.field(pytree_node=False, **kw)


@struct.dataclass
class Lwe128:
    data: Any                  # [..., n+1, 2]

    @property
    def lwe_dimension(self):
        return self.data.shape[-2] - 1


@struct.dataclass
class Glwe128:
    data: Any                  # [..., k+1, N, 2]

    @property
    def polynomial_size(self):
        return self.data.shape[-2]


@struct.dataclass
class NttBootstrapKey128:
    """Same spectral layout as the 64-bit NttLweBootstrapKey; the modulus
    only matters at decompose/reconstruct time."""

    data: Any                  # [n, P, l*(k+1), k+1, N] u64
    shoup: Any = None
    decomp: DecompParams = _static(default=None)

    @property
    def input_lwe_dimension(self):
        return self.data.shape[0]

    @property
    def polynomial_size(self):
        return self.data.shape[-1]


@struct.dataclass
class KeyswitchKey128:
    data: Any                  # [n_in, l, n_out+1, 2]
    decomp: DecompParams = _static(default=None)


def external_product_num_primes128(n: int, glwe_size: int,
                                   decomp: DecompParams) -> int:
    j = decomp.level * glwe_size
    log_bound = np.log2(n) + np.log2(j) + (decomp.base_log - 1) + 128
    return required_num_primes(log_bound)


# ---------------------------------------------------------------------------
# encryption / decryption
# ---------------------------------------------------------------------------


def encrypt_lwe128(key, sk, plaintexts128, noise_std: float) -> Lwe128:
    """sk: LweSecretKey (binary bits — keys are modulus-agnostic);
    plaintexts128: [..., 2].  Reference: lwe_encryption.rs with
    CiphertextModulus<u128>."""
    pts = jnp.asarray(plaintexts128)
    n = sk.lwe_dimension
    mask_key, noise_key = rng.split(key)
    mask = u128.uniform128(mask_key, pts.shape[:-1] + (n,))
    noise = u128.gaussian_noise128(noise_key, pts.shape[:-1], noise_std)
    masked = jnp.where((sk.bits != 0)[..., None], mask,
                       jnp.zeros_like(mask))
    body = u128.add128(u128.add128(u128.sum128(masked, axis=-1), pts), noise)
    return Lwe128(data=jnp.concatenate([mask, body[..., None, :]], axis=-2))


def decrypt_lwe128(ct: Lwe128, sk):
    """Phase b - <a, s> as a u128 [..., 2] value."""
    mask, body = ct.data[..., :-1, :], ct.data[..., -1, :]
    masked = jnp.where((sk.bits != 0)[..., None], mask, jnp.zeros_like(mask))
    return u128.sub128(body, u128.sum128(masked, axis=-1))


def _glwe_mask_dot_key128(mask128, bits, n: int):
    """Σ_i mask_i(X)·s_i(X) mod (X^N+1, 2^128); exact via the wide NTT."""
    prod = negacyclic_polymul128(mask128, bits.astype(jnp.int64),
                                 log_bound=128 + np.log2(n) + 1)
    return u128.sum128(prod, axis=-2)      # sum over the k mask components


def encrypt_glwe128(key, sk, plaintext_polys128, noise_std: float) -> Glwe128:
    """plaintext_polys128 [..., N, 2] → Glwe128 [..., k+1, N, 2]."""
    pts = jnp.asarray(plaintext_polys128)
    k, n = sk.glwe_dimension, sk.polynomial_size
    mask_key, noise_key = rng.split(key)
    mask = u128.uniform128(mask_key, pts.shape[:-2] + (k, n))
    noise = u128.gaussian_noise128(noise_key, pts.shape[:-1], noise_std)
    body = u128.add128(u128.add128(_glwe_mask_dot_key128(mask, sk.bits, n),
                                   pts), noise)
    return Glwe128(data=jnp.concatenate([mask, body[..., None, :, :]], axis=-3))


def decrypt_glwe128(ct: Glwe128, sk):
    mask, body = ct.data[..., :-1, :, :], ct.data[..., -1, :, :]
    n = ct.polynomial_size
    return u128.sub128(body, _glwe_mask_dot_key128(mask, sk.bits, n))


def trivial_glwe128(plaintext_polys128, glwe_dimension: int) -> Glwe128:
    pts = jnp.asarray(plaintext_polys128)
    mask = u128.zeros128(pts.shape[:-2] + (glwe_dimension, pts.shape[-2]))
    return Glwe128(data=jnp.concatenate([mask, pts[..., None, :, :]], axis=-3))


# ---------------------------------------------------------------------------
# GGSW / bootstrap key
# ---------------------------------------------------------------------------


def encrypt_constant_ggsw128(key, sk, msg, decomp: DecompParams,
                             noise_std: float):
    """Body-encoded gadget rows at 2^128, mirroring the 64-bit layout
    (encryption.encrypt_constant_ggsw): row (l, r<k) encrypts -m·g_l·s_r,
    the last row encrypts +m·g_l, with g_l = 2^(128 - B·(l+1)).
    Returns raw data [l, k+1, k+1, N, 2]."""
    k, n = sk.glwe_dimension, sk.polynomial_size
    levels = decomp.level
    assert decomp.base_log * levels <= 64, \
        "gadget factors must stay in the high limb (base_log*level <= 64)"
    keys = rng.split(key, levels * (k + 1))

    m_arr = jnp.asarray(msg).astype(jnp.int64)
    s_bits = sk.bits.astype(jnp.int64)                    # [k, N]
    pts_hi = jnp.zeros((levels, k + 1, n), dtype=U64)
    # all gadget factors g_l = 2^(128 - B(l+1)) have shift >= 64, so the
    # plaintext rows live entirely in the high limb (v·2^(shift-64) mod
    # 2^64 is the correct two's-complement placement for signed small v)
    for l in range(levels):
        shift = 128 - decomp.base_log * (l + 1)
        sh64 = U64(shift - 64)
        pts_hi = pts_hi.at[l, :k, :].set(
            (-(m_arr * s_bits)).astype(U64) << sh64)
        pts_hi = pts_hi.at[l, k, 0].set(m_arr.astype(U64) << sh64)
    pts = u128.make128(pts_hi, jnp.zeros_like(pts_hi))    # [l, k+1, N, 2]

    def enc(subkey, pt):
        return encrypt_glwe128(subkey, sk, pt, noise_std).data

    rows = jax.vmap(enc)(keys, pts.reshape(levels * (k + 1), n, 2))
    return rows.reshape(levels, k + 1, k + 1, n, 2)


def generate_bootstrap_key128(key, lwe_sk, glwe_sk, decomp: DecompParams,
                              noise_std: float):
    """[n, l, k+1, k+1, N, 2] — one GGSW per input key bit (reference
    par_allocate_and_generate_new_lwe_bootstrap_key at u128)."""
    keys = rng.split(key, lwe_sk.lwe_dimension)

    def one(subkey, bit):
        return encrypt_constant_ggsw128(subkey, glwe_sk, bit, decomp,
                                        noise_std)

    return jax.vmap(one)(keys, lwe_sk.bits)


def bootstrap_key128_to_ntt(data128, decomp: DecompParams) -> NttBootstrapKey128:
    """u128 BSK → CRT-NTT spectra (the f128-Fourier conversion analogue,
    reference par_convert_standard_lwe_bootstrap_key_to_fourier_128)."""
    n_in, levels, glwe_size, _, n, _ = data128.shape
    npr = external_product_num_primes128(n, glwe_size, decomp)
    plan = get_plan(n, npr)
    hat = ntt_forward128(plan, data128)      # [n, l, row, comp, P, N]
    hat = jnp.moveaxis(hat, -2, 1)           # [n, P, l, row, comp, N]
    hat = hat.reshape(n_in, npr, levels * glwe_size, glwe_size, n)
    p64 = jnp.asarray(plan.p64[:, None, None, :])
    sh = (hat << U64(32)) // p64             # cold keygen-time division
    return NttBootstrapKey128(data=hat, shoup=sh, decomp=decomp)


# ---------------------------------------------------------------------------
# the PBS pipeline
# ---------------------------------------------------------------------------


def modulus_switch128(x128, polynomial_size: int):
    """u128 torus → Z_{2N}: the switch discards all but the top bits, which
    live in the high limb, so this is the 64-bit switch on limb 0
    (reference fft128 fast_pbs_modulus_switch)."""
    from .bootstrap import modulus_switch
    return modulus_switch(x128[..., 0], 64, polynomial_size)


def monomial_mul128(poly128, t):
    """X^t · poly mod X^N+1 for u128 polys [..., N, 2]; same roll + sign-mask
    as poly.monomial_mul with a two's-complement flip."""
    n = poly128.shape[-2]
    t = jnp.asarray(t)
    t_red = t % (2 * n)
    flip = t_red >= n
    rot = jnp.where(flip, t_red - n, t_red)
    idx = jnp.arange(n)
    batch = jnp.broadcast_shapes(poly128.shape[:-2], rot.shape)
    src = jnp.broadcast_to((idx - rot[..., None]) % n, batch + (n,))
    poly_b = jnp.broadcast_to(poly128, batch + (n, 2))
    shifted = jnp.take_along_axis(poly_b, src[..., None], axis=-2)
    sign_neg = (idx < rot[..., None]) ^ flip[..., None]
    return u128.where128(sign_neg, u128.neg128(shifted), shifted)


def external_product_accumulate128(acc128, operand128, bsk_slice,
                                   decomp: DecompParams, bsk_shoup=None):
    """acc += GGSW ⊡ operand at 2^128: decompose → small-digit NTT (shared
    with the 64-bit path) → MAC → wide Garner back to two limbs."""
    n = acc128.shape[-2]
    glwe_size = acc128.shape[-3]
    num_primes = bsk_slice.shape[-4]
    plan = get_plan(n, num_primes)

    digits = signed_decompose128(operand128, decomp)      # [..., k+1, N, l]
    digits = jnp.moveaxis(digits, -1, -3)                 # [..., l, k+1, N]
    digits = digits.reshape(*digits.shape[:-3], decomp.level * glwe_size, n)
    d_hat = ntt_forward_digits(plan, digits)              # [..., J, P, N]
    d_hat = jnp.moveaxis(d_hat, -2, -3)                   # [..., P, J, N]
    prod = pointwise_mac(plan, d_hat, bsk_slice, bsk_shoup)
    prod = jnp.moveaxis(prod, -3, -2)                     # [..., R, P, N]
    delta = garner_to_torus128(plan, ntt_inverse(plan, prod))
    return u128.add128(acc128, delta)


def blind_rotate128(lut: Glwe128, lwe: Lwe128,
                    bsk: NttBootstrapKey128) -> Glwe128:
    """Reference fft128/crypto/bootstrap.rs blind_rotate_assign, batched."""
    n_poly = bsk.polynomial_size
    n_in = bsk.input_lwe_dimension
    batch_shape = lwe.data.shape[:-2]

    switched = modulus_switch128(lwe.data, n_poly)        # [..., n+1]
    a_sw, b_sw = switched[..., :-1], switched[..., -1]

    acc = monomial_mul128(
        jnp.broadcast_to(lut.data, batch_shape + lut.data.shape[-3:]),
        (2 * n_poly - b_sw)[..., None])

    def step(j, acc):
        aj = a_sw[..., j]
        rotated = monomial_mul128(acc, aj[..., None])
        diff = u128.sub128(rotated, acc)
        bsk_j = jax.lax.dynamic_index_in_dim(bsk.data, j, axis=0, keepdims=False)
        shoup_j = (None if bsk.shoup is None else
                   jax.lax.dynamic_index_in_dim(bsk.shoup, j, axis=0,
                                                keepdims=False))
        return external_product_accumulate128(acc, diff, bsk_j, bsk.decomp,
                                              bsk_shoup=shoup_j)

    return Glwe128(data=jax.lax.fori_loop(0, n_in, step, acc))


def sample_extract128(glwe: Glwe128, index: int = 0) -> Lwe128:
    """algorithms/glwe_sample_extraction.rs at u128."""
    n = glwe.polynomial_size
    mask = glwe.data[..., :-1, :, :]                      # [..., k, N, 2]
    j = jnp.arange(n)
    src = (index - j) % n
    sign_neg = j > index
    rows = mask[..., :, src, :]
    rows = u128.where128(sign_neg, u128.neg128(rows), rows)
    flat = rows.reshape(*rows.shape[:-3], -1, 2)          # [..., k*N, 2]
    body = glwe.data[..., -1, index, :]
    return Lwe128(data=jnp.concatenate([flat, body[..., None, :]], axis=-2))


def programmable_bootstrap128(lwe: Lwe128, lut: Glwe128,
                              bsk: NttBootstrapKey128) -> Lwe128:
    """Full 128-bit PBS (reference
    programmable_bootstrap_f128_lwe_ciphertext)."""
    return sample_extract128(blind_rotate128(lut, lwe, bsk), 0)


# ---------------------------------------------------------------------------
# 128-bit keyswitch
# ---------------------------------------------------------------------------


def generate_keyswitch_key128(key, in_sk, out_sk, decomp: DecompParams,
                              noise_std: float) -> KeyswitchKey128:
    """KSK[i, l] = LWE128_out(s_in[i] · 2^(128 - B(l+1)))."""
    n_in = in_sk.lwe_dimension
    levels = decomp.level
    bits = in_sk.bits.astype(U64)
    pts_hi = jnp.zeros((n_in, levels), dtype=U64)
    pts_lo = jnp.zeros((n_in, levels), dtype=U64)
    for l in range(levels):
        shift = 128 - decomp.base_log * (l + 1)
        if shift >= 64:
            pts_hi = pts_hi.at[:, l].set(
                bits << U64(shift - 64) if shift > 64 else bits)
        else:
            pts_lo = pts_lo.at[:, l].set(bits << U64(shift))
            pts_hi = pts_hi.at[:, l].set(bits >> U64(64 - shift))
    ct = encrypt_lwe128(key, out_sk, u128.make128(pts_hi, pts_lo), noise_std)
    return KeyswitchKey128(data=ct.data, decomp=decomp)


def keyswitch128(ct: Lwe128, ksk: KeyswitchKey128) -> Lwe128:
    """out = (0, b) - Σ_{i,l} d_{i,l} · KSK[i,l]  (lwe_keyswitch.rs at u128)."""
    mask, body = ct.data[..., :-1, :], ct.data[..., -1, :]
    digits = signed_decompose128(mask, ksk.decomp)        # [..., n_in, L]
    terms = u128.mul_small_signed_by_128(
        digits[..., None],                                # [..., n_in, L, 1]
        ksk.data)                                         # [n_in, L, n_out+1, 2]
    acc = u128.sum128(u128.sum128(terms, axis=-2), axis=-2)   # [..., n_out+1, 2]
    out = u128.neg128(acc)
    out_body = u128.add128(out[..., -1, :], body)
    return Lwe128(data=jnp.concatenate([out[..., :-1, :],
                                        out_body[..., None, :]], axis=-2))
