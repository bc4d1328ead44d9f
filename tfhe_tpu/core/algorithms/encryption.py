"""Key generation and encryption/decryption for LWE / GLWE / GGSW.

Covers the reference algorithm files `lwe_encryption.rs`, `glwe_encryption.rs`,
`ggsw_encryption.rs`, `lwe_secret_key_generation.rs`,
`glwe_secret_key_generation.rs`, `lwe_bootstrap_key_generation.rs`,
`lwe_keyswitch_key_generation.rs` (tfhe/src/core_crypto/algorithms/) —
re-expressed as pure functions over batched arrays with counter-based
deterministic randomness (rng.fork replaces the reference's CSPRNG fork maps).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import rng
from ..decomposition import signed_decompose
from ..entities import (GgswCiphertext, GlweCiphertext, GlweSecretKey,
                        LweBootstrapKey, LweCiphertext, LweKeyswitchKey,
                        LwePackingKeyswitchKey, LweSecretKey, NttLweBootstrapKey)
from ..numeric import torus_dtype
from ..params import DecompParams
from ..poly import get_plan, negacyclic_polymul, ntt_forward, required_num_primes

# ---------------------------------------------------------------------------
# secret keys
# ---------------------------------------------------------------------------


def generate_lwe_secret_key(key, lwe_dimension: int) -> LweSecretKey:
    return LweSecretKey(bits=rng.binary_key(key, (lwe_dimension,)))


def generate_glwe_secret_key(key, glwe_dimension: int, polynomial_size: int) -> GlweSecretKey:
    return GlweSecretKey(bits=rng.binary_key(key, (glwe_dimension, polynomial_size)))


# ---------------------------------------------------------------------------
# LWE
# ---------------------------------------------------------------------------


def _mask_dot_key(mask, bits, dtype):
    """<a, s> for binary s — a masked sum (no multiply needed)."""
    sel = jnp.where(bits.astype(jnp.int32) != 0, mask, jnp.zeros_like(mask))
    return sel.sum(axis=-1, dtype=dtype)


def encrypt_lwe(key, sk: LweSecretKey, plaintexts, noise_std: float, log_q: int) -> LweCiphertext:
    """Encrypt a batch of torus plaintexts [...] → LweCiphertext [..., n+1].
    Reference: encrypt_lwe_ciphertext (algorithms/lwe_encryption.rs:223)."""
    dt = torus_dtype(log_q)
    pts = jnp.asarray(plaintexts).astype(dt)
    n = sk.lwe_dimension
    mask_key, noise_key = rng.split(key)
    mask = rng.uniform_torus(mask_key, pts.shape + (n,), log_q)
    noise = rng.gaussian_noise(noise_key, pts.shape, noise_std, log_q)
    body = _mask_dot_key(mask, sk.bits, dt) + pts + noise
    return LweCiphertext(data=jnp.concatenate([mask, body[..., None]], axis=-1))


def encrypt_lwe_deterministic_mask(mask, sk: LweSecretKey, plaintexts, noise, log_q: int):
    """Body computation given externally drawn mask/noise (used by seeded
    entities and key generation loops)."""
    dt = torus_dtype(log_q)
    body = _mask_dot_key(mask, sk.bits, dt) + jnp.asarray(plaintexts).astype(dt) + noise
    return jnp.concatenate([mask, body[..., None]], axis=-1)


def decrypt_lwe(ct: LweCiphertext, sk: LweSecretKey, log_q: int):
    """Phase b - <a, s> (message + noise).  Reference: decrypt_lwe_ciphertext
    (algorithms/lwe_encryption.rs:502)."""
    dt = torus_dtype(log_q)
    return ct.body - _mask_dot_key(ct.mask, sk.bits, dt)


def trivial_lwe(plaintexts, lwe_dimension: int, log_q: int) -> LweCiphertext:
    dt = torus_dtype(log_q)
    pts = jnp.asarray(plaintexts).astype(dt)
    mask = jnp.zeros(pts.shape + (lwe_dimension,), dtype=dt)
    return LweCiphertext(data=jnp.concatenate([mask, pts[..., None]], axis=-1))


# ---------------------------------------------------------------------------
# GLWE
# ---------------------------------------------------------------------------


def _glwe_mask_dot_key(mask, bits, log_q: int):
    """Σ_i a_i * s_i over Z_q[X]/(X^N+1) for binary key polys.

    mask [..., k, N] torus, bits [k, N] ∈ {0,1} → [..., N].
    Exact via CRT-NTT (bound: N * 2^q * k; uint32 inputs enter the NTT as
    unsigned representatives, hence log_q not log_q - 1)."""
    n = mask.shape[-1]
    k = bits.shape[-2]
    log_bound = log_q + np.log2(n) + np.log2(max(k, 1))
    plan = get_plan(n, required_num_primes(log_bound))
    m_hat = ntt_forward(plan, mask)                   # [..., k, P, N] u64 < p
    s_hat = ntt_forward(plan, bits.astype(jnp.int8))  # [k, P, N] u64 < p
    p64 = jnp.asarray(plan.p64)
    prod = (m_hat * s_hat) % p64
    acc = prod.sum(axis=-3) % p64                     # k*p^2 < 2^64 for k<=6
    from ..poly import garner_to_torus, ntt_inverse
    return garner_to_torus(plan, ntt_inverse(plan, acc), log_q)


def encrypt_glwe(key, sk: GlweSecretKey, plaintext_polys, noise_std: float,
                 log_q: int) -> GlweCiphertext:
    """plaintext_polys [..., N] → GlweCiphertext [..., k+1, N].
    Reference: encrypt_glwe_ciphertext (algorithms/glwe_encryption.rs)."""
    dt = torus_dtype(log_q)
    pts = jnp.asarray(plaintext_polys).astype(dt)
    k, n = sk.glwe_dimension, sk.polynomial_size
    mask_key, noise_key = rng.split(key)
    mask = rng.uniform_torus(mask_key, pts.shape[:-1] + (k, n), log_q)
    noise = rng.gaussian_noise(noise_key, pts.shape, noise_std, log_q)
    body = _glwe_mask_dot_key(mask, sk.bits, log_q) + pts + noise
    return GlweCiphertext(data=jnp.concatenate([mask, body[..., None, :]], axis=-2))


def decrypt_glwe(ct: GlweCiphertext, sk: GlweSecretKey, log_q: int):
    return ct.body - _glwe_mask_dot_key(ct.mask, sk.bits, log_q)


def trivial_glwe(plaintext_polys, glwe_dimension: int, log_q: int) -> GlweCiphertext:
    dt = torus_dtype(log_q)
    pts = jnp.asarray(plaintext_polys).astype(dt)
    mask = jnp.zeros(pts.shape[:-1] + (glwe_dimension, pts.shape[-1]), dtype=dt)
    return GlweCiphertext(data=jnp.concatenate([mask, pts[..., None, :]], axis=-2))


# ---------------------------------------------------------------------------
# GGSW & bootstrap key
# ---------------------------------------------------------------------------


def encrypt_constant_ggsw(key, sk: GlweSecretKey, msg, decomp: DecompParams,
                          noise_std: float, log_q: int) -> GgswCiphertext:
    """GGSW of a small constant message (reference
    encrypt_constant_ggsw_ciphertext, algorithms/ggsw_encryption.rs):
    encrypt zero GLWEs, then add m*q/B^(l+1) on the diagonal component —
    adding δ to mask component r encrypts -δ·s_r; adding to the body encrypts +δ.
    """
    dt = torus_dtype(log_q)
    k, n = sk.glwe_dimension, sk.polynomial_size
    levels = decomp.level
    keys = rng.split(key, levels * (k + 1))

    # Body-encoded gadget rows (reference encrypt_constant_ggsw_ciphertext):
    # row (l, r<k) encrypts the plaintext poly -m*g_l*s_r; the last row
    # encrypts the constant m*g_l.  Equivalent phase to adding +m*g_l on the
    # mask diagonal, but keeps all message content in the bodies — which is
    # what makes the Seeded* compressed twins possible (seeded.py).
    m = jnp.asarray(msg).astype(jnp.int64)
    lvl_factors = jnp.stack(
        [(m.astype(dt) * (dt(1) << dt(log_q - decomp.base_log * (l + 1))))
         for l in range(levels)])                        # [levels]
    s_bits = sk.bits.astype(jnp.int64)                   # [k, N]
    pts = jnp.zeros((levels, k + 1, n), dtype=dt)
    neg_ms = (-(lvl_factors[:, None, None].astype(jnp.uint64).astype(jnp.int64)
                * s_bits[None, :, :])).astype(dt)        # [levels, k, N]
    pts = pts.at[:, :k, :].set(neg_ms)
    pts = pts.at[:, k, 0].set(lvl_factors)

    def enc(subkey, pt):
        return encrypt_glwe(subkey, sk, pt, noise_std, log_q).data

    rows = jax.vmap(enc)(keys, pts.reshape(levels * (k + 1), n))
    return GgswCiphertext(data=rows.reshape(levels, k + 1, k + 1, n),
                          decomp=decomp)


def generate_bootstrap_key(key, lwe_sk: LweSecretKey, glwe_sk: GlweSecretKey,
                           decomp: DecompParams, noise_std: float,
                           log_q: int) -> LweBootstrapKey:
    """One GGSW per input-LWE key bit, with deterministically forked streams —
    parallel generation reproduces sequential output by construction.
    Reference: par_allocate_and_generate_new_lwe_bootstrap_key
    (algorithms/lwe_bootstrap_key_generation.rs)."""
    n_in = lwe_sk.lwe_dimension
    keys = rng.split(key, n_in)

    def one(subkey, bit):
        return encrypt_constant_ggsw(subkey, glwe_sk, bit, decomp, noise_std, log_q).data

    data = jax.vmap(one)(keys, lwe_sk.bits)
    return LweBootstrapKey(data=data, decomp=decomp)


def bootstrap_key_to_ntt(bsk: LweBootstrapKey, log_q: int,
                         num_primes: int) -> NttLweBootstrapKey:
    """Pre-transform every BSK polynomial into the CRT-NTT domain (the
    Fourier-BSK conversion, reference
    par_convert_standard_lwe_bootstrap_key_to_fourier).

    Output layout [n, P, l*(k+1), k+1, N] uint32 — contraction axis (level,
    input-component) flattened, ready for the external-product MAC — plus
    the Shoup-quotient twin for division-free MACs."""
    n_in, levels, glwe_size, _, n = bsk.data.shape
    plan = get_plan(n, num_primes)
    hat = ntt_forward(plan, bsk.data)        # [n, l, k+1(row), k+1(comp), P, N]
    hat = jnp.moveaxis(hat, -2, 1)           # [n, P, l, row, comp, N]
    hat = hat.reshape(n_in, plan.num_primes, levels * glwe_size, glwe_size, n)
    p64 = jnp.asarray(plan.p64[:, None, None, :])    # [P,1,1,1]
    sh = (hat << jnp.uint64(32)) // p64              # keygen-time division: cold
    key = NttLweBootstrapKey(data=hat, shoup=sh, decomp=bsk.decomp, log_q=log_q)
    # the fused kernel's approximate-mulhi Shoup path requires p < 2^30
    if log_q == 64 and all(p < (1 << 30) for p in plan.primes):
        from ... import config
        if config.use_mxu_ntt():
            # MXU kernel runs the delta-CMUX step — it needs only the plain
            # GGSW(s) spectra (u32 + shoup), permuted to four-step order;
            # phases come from the full-exponent HBM table at rotation time.
            from ..poly.fourstep import monomial_tables_for, perm_from_dif
            perm = jnp.asarray(perm_from_dif(n))
            paired = hat.astype(jnp.uint32)[..., perm]
            paired_sh = sh.astype(jnp.uint32)[..., perm]
            lanes = config.use_mxu_lanes() and n < 16384
            tab, tab_sh = monomial_tables_for(n, num_primes, True,
                                              lanes=lanes)
            order = "fourstep-lanes" if lanes else "fourstep"
            mono, mono_sh = jnp.asarray(tab), jnp.asarray(tab_sh)
        else:
            paired, paired_sh = bootstrap_key_to_ntt_paired(key, log_q)
            mono = mono_sh = None
            order = "dif"
        key = NttLweBootstrapKey(data=hat, shoup=sh, paired=paired,
                                 paired_shoup=paired_sh, mono=mono,
                                 mono_shoup=mono_sh, decomp=bsk.decomp,
                                 log_q=log_q, paired_order=order)
    return key


def trivial_ggsw_one_ntt(n: int, glwe_size: int, decomp: DecompParams,
                         num_primes: int, log_q: int):
    """NTT spectra of the *trivial* GGSW of 1 (the gadget matrix itself):
    row (l, r) has the constant polynomial q/B^(l+1) at component r, whose
    spectrum is that constant in every slot.  Layout [P, l*(k+1), k+1, N]."""
    plan = get_plan(n, num_primes)
    levels = decomp.level
    out = np.zeros((plan.num_primes, levels * glwe_size, glwe_size, n),
                   dtype=np.uint64)
    for l in range(levels):
        g = (1 << (log_q - decomp.base_log * (l + 1))) % (1 << 64)
        # signed representative mod p of the torus constant g
        gs = g - (1 << 64) if g >= 1 << 63 else g
        for r in range(glwe_size):
            for pi, p in enumerate(plan.primes):
                out[pi, l * glwe_size + r, r, :] = gs % p
    return jnp.asarray(out)


def bootstrap_key_to_ntt_paired(bsk: NttLweBootstrapKey, log_q: int):
    """Classic NTT BSK → paired form for the gather-free phase-domain blind
    rotation: pair0 = GGSW(1 - s_i) = GGSW_trivial(1) - GGSW(s_i),
    pair1 = GGSW(s_i).  Output (data [n, 2, P, J, R, N], shoup twin).

    The blind-rotation step then computes
        acc ← (pair0 + X^ã·pair1) ⊡ acc
    with the monomial applied as a pointwise phase in the NTT domain —
    no coefficient-space rotation, no gather (pallas_ntt.py)."""
    n_in, npr, J, R, n = bsk.data.shape
    plan = get_plan(n, npr)
    g1 = trivial_ggsw_one_ntt(n, R, bsk.decomp, npr, log_q)      # [P, J, R, N]
    p64 = jnp.asarray(plan.p64[:, None, None, :])
    pair1 = bsk.data
    pair0 = (g1 + p64 - pair1) % p64
    data = jnp.stack([pair0, pair1], axis=1)                     # [n, 2, P, J, R, N]
    sh = (data << jnp.uint64(32)) // p64
    return data.astype(jnp.uint32), sh.astype(jnp.uint32)


# ---------------------------------------------------------------------------
# keyswitch keys
# ---------------------------------------------------------------------------


def generate_keyswitch_key(key, in_sk: LweSecretKey, out_sk: LweSecretKey,
                           decomp: DecompParams, noise_std: float,
                           log_q: int) -> LweKeyswitchKey:
    """KSK[i, l] = LWE_out( s_in[i] * q/B^(l+1) ).
    Reference: allocate_and_generate_new_lwe_keyswitch_key
    (algorithms/lwe_keyswitch_key_generation.rs)."""
    dt = torus_dtype(log_q)
    n_in = in_sk.lwe_dimension
    levels = decomp.level
    weights = jnp.stack([dt(1) << dt(log_q - decomp.base_log * (l + 1))
                         for l in range(levels)])
    pts = in_sk.bits.astype(dt)[:, None] * weights[None, :]      # [n_in, l]
    ct = encrypt_lwe(key, out_sk, pts, noise_std, log_q)
    return LweKeyswitchKey(data=ct.data, decomp=decomp)


def generate_packing_keyswitch_key(key, in_sk: LweSecretKey, out_sk: GlweSecretKey,
                                   decomp: DecompParams, noise_std: float,
                                   log_q: int) -> LwePackingKeyswitchKey:
    """PKSK[i, l] = GLWE_out( s_in[i] * q/B^(l+1) ) (constant polynomial).
    Reference: lwe_packing_keyswitch_key_generation.rs."""
    dt = torus_dtype(log_q)
    n_in = in_sk.lwe_dimension
    levels = decomp.level
    n = out_sk.polynomial_size
    weights = jnp.stack([dt(1) << dt(log_q - decomp.base_log * (l + 1))
                         for l in range(levels)])
    pts = jnp.zeros((n_in, levels, n), dtype=dt)
    pts = pts.at[:, :, 0].set(in_sk.bits.astype(dt)[:, None] * weights[None, :])
    ct = encrypt_glwe(key, out_sk, pts, noise_std, log_q)
    return LwePackingKeyswitchKey(data=ct.data, decomp=decomp)
