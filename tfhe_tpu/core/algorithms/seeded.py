"""Seeded (compressed) entities: store only a PRNG seed + ciphertext bodies;
masks are regenerated deterministically on decompression.

Re-design of the reference's 12 `Seeded*` entity twins + their
`seeded_*_decompression.rs` algorithms (SURVEY.md §2.3, §5.4): because every
mask in this framework is already drawn from a counter-based stream keyed by
a fork path (rng.py), a compressed entity is just (seed-key, bodies) and
decompression replays the mask stream.  Compression ratios match the
reference: LWE n+1 → 1 limb, GLWE (k+1)N → N, BSK n·l·(k+1)²·N →
n·l·(k+1)·N.
"""
from __future__ import annotations

from typing import Any

import flax.struct as struct
import jax
import jax.numpy as jnp

from .. import rng
from ..entities import (GgswCiphertext, GlweCiphertext, LweBootstrapKey,
                        LweCiphertext, LweKeyswitchKey, LwePackingKeyswitchKey)
from ..numeric import torus_dtype
from ..params import DecompParams


def _static(**kw):
    return struct.field(pytree_node=False, **kw)


@struct.dataclass
class SeededLweCiphertext:
    """bodies [..., 1] + the 32-bit seed of the mask stream."""

    body: Any
    seed: int = _static(default=0)
    lwe_dimension: int = _static(default=0)
    log_q: int = _static(default=64)


@struct.dataclass
class SeededGlweCiphertext:
    body: Any          # [..., N]
    seed: int = _static(default=0)
    glwe_dimension: int = _static(default=0)
    log_q: int = _static(default=64)


@struct.dataclass
class SeededLweBootstrapKey:
    """GGSW bodies only: [n, l, k+1, N] (the body poly of each row GLWE)."""

    bodies: Any
    seed: int = _static(default=0)
    decomp: DecompParams = _static(default=None)
    log_q: int = _static(default=64)


@struct.dataclass
class SeededLweKeyswitchKey:
    bodies: Any        # [n_in, l]
    seed: int = _static(default=0)
    decomp: DecompParams = _static(default=None)
    output_lwe_dimension: int = _static(default=0)
    log_q: int = _static(default=64)


# -- mask stream layout: mirrors the encryption functions ------------------


def _mask_key(seed: int):
    return rng.split(rng.fork(rng.key_from_seed(seed), 0x3E))[0]


def compress_lwe(ct: LweCiphertext, seed_mask, seed: int, log_q: int) -> SeededLweCiphertext:
    """Build the seeded form of a ciphertext whose mask equals the stream of
    `seed` (callers must have encrypted with `seeded_mask_for`)."""
    return SeededLweCiphertext(body=ct.body, seed=seed,
                               lwe_dimension=ct.lwe_dimension, log_q=log_q)


def seeded_mask_for(seed: int, shape, n: int, log_q: int):
    return rng.uniform_torus(_mask_key(seed), tuple(shape) + (n,), log_q)


def encrypt_lwe_seeded(seed: int, sk, plaintexts, noise_std: float, log_q: int):
    """Encrypt with a seed-derived mask; returns the compressed form."""
    from .encryption import encrypt_lwe_deterministic_mask
    pts = jnp.asarray(plaintexts).astype(torus_dtype(log_q))
    mask = seeded_mask_for(seed, pts.shape, sk.lwe_dimension, log_q)
    noise_key = rng.split(rng.fork(rng.key_from_seed(seed), 0x3E))[1]
    noise = rng.gaussian_noise(noise_key, pts.shape, noise_std, log_q)
    data = encrypt_lwe_deterministic_mask(mask, sk, pts, noise, log_q)
    return SeededLweCiphertext(body=data[..., -1], seed=seed,
                               lwe_dimension=sk.lwe_dimension, log_q=log_q)


def decompress_lwe(sct: SeededLweCiphertext) -> LweCiphertext:
    """reference seeded_lwe_ciphertext_decompression.rs."""
    mask = seeded_mask_for(sct.seed, sct.body.shape, sct.lwe_dimension, sct.log_q)
    return LweCiphertext(data=jnp.concatenate([mask, sct.body[..., None]], axis=-1))


def compress_bootstrap_key(bsk: LweBootstrapKey, seed: int, log_q: int) -> SeededLweBootstrapKey:
    """Keep only row bodies; masks must come from the seed's stream — use
    `generate_seeded_bootstrap_key` to produce a compressible key."""
    return SeededLweBootstrapKey(bodies=bsk.data[..., -1, :], seed=seed,
                                 decomp=bsk.decomp, log_q=log_q)


def generate_seeded_bootstrap_key(seed: int, lwe_sk, glwe_sk,
                                  decomp: DecompParams, noise_std: float,
                                  log_q: int):
    """(full_key, seeded_key): generate a BSK whose GLWE masks are the
    deterministic stream of `seed`, so the seeded twin is exact."""
    from .encryption import generate_bootstrap_key
    full = generate_bootstrap_key(rng.key_from_seed(seed), lwe_sk, glwe_sk,
                                  decomp, noise_std, log_q)
    return full, SeededLweBootstrapKey(bodies=full.data[..., -1, :], seed=seed,
                                       decomp=decomp, log_q=log_q)


def ggsw_masks_from_key(subkey, levels: int, glwe_size: int, n_poly: int,
                        log_q: int):
    """Replay the public GLWE-mask stream of one `encrypt_constant_ggsw` call
    (masks are drawn before secrets touch the data).  Must stay in lockstep
    with the key-fork structure of encryption.encrypt_constant_ggsw /
    encrypt_glwe.  Returns [l, k+1, k, N]."""
    k = glwe_size - 1
    row_keys = rng.split(subkey, levels * glwe_size)

    def per_row(rk):
        mask_key = rng.split(rk)[0]
        return rng.uniform_torus(mask_key, (k, n_poly), log_q)

    return jax.vmap(per_row)(row_keys).reshape(levels, glwe_size, k, n_poly)


def bsk_masks_from_seed(seed: int, n_in: int, levels: int, glwe_size: int,
                        n_poly: int, log_q: int):
    """Replay the public mask stream of `generate_bootstrap_key` WITHOUT any
    secret material: one GGSW stream per input key bit."""
    keys = rng.split(rng.key_from_seed(seed), n_in)    # per input bit
    return jax.vmap(
        lambda sk_: ggsw_masks_from_key(sk_, levels, glwe_size, n_poly, log_q)
    )(keys)                                            # [n, l, k+1, k, N]


def decompress_bootstrap_key(sbsk: SeededLweBootstrapKey) -> LweBootstrapKey:
    """reference seeded_lwe_bootstrap_key_decompression.rs — regenerate the
    masks from the seed (public data only) and splice the stored bodies."""
    n_in, levels, glwe_size, n_poly = sbsk.bodies.shape
    masks = bsk_masks_from_seed(sbsk.seed, n_in, levels, glwe_size, n_poly,
                                sbsk.log_q)
    data = jnp.concatenate([masks, sbsk.bodies[..., None, :]], axis=-2)
    return LweBootstrapKey(data=data, decomp=sbsk.decomp)


def generate_seeded_keyswitch_key(seed: int, in_sk, out_sk, decomp,
                                  noise_std: float, log_q: int):
    """(full KSK, seeded twin): masks drawn from the seed's replayable stream."""
    from .encryption import generate_keyswitch_key
    full = generate_keyswitch_key(rng.key_from_seed(seed), in_sk, out_sk,
                                  decomp, noise_std, log_q)
    seeded = SeededLweKeyswitchKey(
        bodies=full.data[..., -1], seed=seed, decomp=decomp,
        output_lwe_dimension=out_sk.lwe_dimension, log_q=log_q)
    return full, seeded


def decompress_keyswitch_key(skk: SeededLweKeyswitchKey) -> LweKeyswitchKey:
    """Replay the public mask stream of generate_keyswitch_key (which calls
    encrypt_lwe once over the [n_in, l] plaintext grid)."""
    n_in, levels = skk.bodies.shape
    root = rng.key_from_seed(skk.seed)
    mask_key = rng.split(root)[0]
    mask = rng.uniform_torus(mask_key, (n_in, levels, skk.output_lwe_dimension),
                             skk.log_q)
    data = jnp.concatenate([mask, skk.bodies[..., None]], axis=-1)
    return LweKeyswitchKey(data=data, decomp=skk.decomp)


# ---------------------------------------------------------------------------
# GLWE ciphertext twin  (reference seeded_glwe_ciphertext.rs; lists are the
# leading batch axes of `body`, covering SeededGlweCiphertextList too)
# ---------------------------------------------------------------------------


def encrypt_glwe_seeded(seed: int, sk, plaintext_polys, noise_std: float,
                        log_q: int) -> SeededGlweCiphertext:
    """Encrypt with a seed-derived mask; (k+1)·N limbs compress to N."""
    from .encryption import _glwe_mask_dot_key
    dt = torus_dtype(log_q)
    pts = jnp.asarray(plaintext_polys).astype(dt)
    k, n = sk.glwe_dimension, sk.polynomial_size
    stream = rng.split(rng.fork(rng.key_from_seed(seed), 0x3E))
    mask = rng.uniform_torus(stream[0], pts.shape[:-1] + (k, n), log_q)
    noise = rng.gaussian_noise(stream[1], pts.shape, noise_std, log_q)
    body = _glwe_mask_dot_key(mask, sk.bits, log_q) + pts + noise
    return SeededGlweCiphertext(body=body, seed=seed, glwe_dimension=k,
                                log_q=log_q)


def decompress_glwe(sct: SeededGlweCiphertext) -> GlweCiphertext:
    """reference seeded_glwe_ciphertext_decompression.rs."""
    k, n = sct.glwe_dimension, sct.body.shape[-1]
    stream = rng.split(rng.fork(rng.key_from_seed(sct.seed), 0x3E))
    mask = rng.uniform_torus(stream[0], sct.body.shape[:-1] + (k, n), sct.log_q)
    return GlweCiphertext(
        data=jnp.concatenate([mask, sct.body[..., None, :]], axis=-2))


# ---------------------------------------------------------------------------
# GGSW twins  (reference seeded_ggsw_ciphertext.rs / seeded_ggsw_ciphertext_
# list.rs + their decompression algorithms)
# ---------------------------------------------------------------------------


@struct.dataclass
class SeededGgswCiphertextList:
    """Row bodies only: [count, l, k+1, N] (l·(k+1)² polys → l·(k+1)).
    A single SeededGgswCiphertext is the count==1 slice."""

    bodies: Any
    seed: int = _static(default=0)
    decomp: DecompParams = _static(default=None)
    log_q: int = _static(default=64)


def generate_seeded_ggsw_list(seed: int, glwe_sk, msgs, decomp: DecompParams,
                              noise_std: float, log_q: int):
    """(full GGSW list [count, l, k+1, k+1, N], seeded twin): one forked
    stream per GGSW, same fork layout as generate_bootstrap_key."""
    from .encryption import encrypt_constant_ggsw
    msgs = jnp.asarray(msgs)
    keys = rng.split(rng.key_from_seed(seed), msgs.shape[0])

    def one(subkey, m):
        return encrypt_constant_ggsw(subkey, glwe_sk, m, decomp,
                                     noise_std, log_q).data

    full = jax.vmap(one)(keys, msgs)
    seeded = SeededGgswCiphertextList(bodies=full[..., -1, :], seed=seed,
                                      decomp=decomp, log_q=log_q)
    return full, seeded


def decompress_ggsw_list(s: SeededGgswCiphertextList):
    """reference seeded_ggsw_ciphertext_list_decompression.rs — the mask
    stream is identical to a BSK's (one GGSW stream per entry)."""
    count, levels, glwe_size, n_poly = s.bodies.shape
    masks = bsk_masks_from_seed(s.seed, count, levels, glwe_size, n_poly,
                                s.log_q)
    data = jnp.concatenate([masks, s.bodies[..., None, :]], axis=-2)
    return [GgswCiphertext(data=data[i], decomp=s.decomp)
            for i in range(count)]


# ---------------------------------------------------------------------------
# Multi-bit BSK twin  (reference seeded_lwe_multi_bit_bootstrap_key.rs)
# ---------------------------------------------------------------------------


@struct.dataclass
class SeededLweMultiBitBootstrapKey:
    """GGSW row bodies [n/g, 2^g, l, k+1, N] of the standard-domain key."""

    bodies: Any
    seed: int = _static(default=0)
    decomp: DecompParams = _static(default=None)
    grouping_factor: int = _static(default=2)
    log_q: int = _static(default=64)


def generate_seeded_multi_bit_bootstrap_key(seed: int, lwe_sk, glwe_sk,
                                            decomp: DecompParams,
                                            grouping_factor: int,
                                            noise_std: float, log_q: int):
    """(full std-domain key data, seeded twin) — feed the full data to
    multi_bit.multi_bit_bootstrap_key_to_ntt for compute."""
    from .multi_bit import generate_multi_bit_bootstrap_key
    full = generate_multi_bit_bootstrap_key(
        rng.key_from_seed(seed), lwe_sk, glwe_sk, decomp, grouping_factor,
        noise_std, log_q)
    seeded = SeededLweMultiBitBootstrapKey(
        bodies=full[..., -1, :], seed=seed, decomp=decomp,
        grouping_factor=grouping_factor, log_q=log_q)
    return full, seeded


def decompress_multi_bit_bootstrap_key(s: SeededLweMultiBitBootstrapKey):
    """reference seeded_lwe_multi_bit_bootstrap_key_decompression.rs — the
    generator forks ng·2^g GGSW streams flat, so the BSK replay applies."""
    ng, nv, levels, glwe_size, n_poly = s.bodies.shape
    masks = bsk_masks_from_seed(s.seed, ng * nv, levels, glwe_size, n_poly,
                                s.log_q).reshape(ng, nv, levels, glwe_size,
                                                 glwe_size - 1, n_poly)
    return jnp.concatenate([masks, s.bodies[..., None, :]], axis=-2)


# ---------------------------------------------------------------------------
# Packing-KSK twin  (reference seeded_lwe_packing_keyswitch_key.rs)
# ---------------------------------------------------------------------------


@struct.dataclass
class SeededLwePackingKeyswitchKey:
    bodies: Any        # [n_in, l, N]
    seed: int = _static(default=0)
    decomp: DecompParams = _static(default=None)
    glwe_dimension: int = _static(default=1)
    log_q: int = _static(default=64)


def generate_seeded_packing_keyswitch_key(seed: int, in_sk, out_sk, decomp,
                                          noise_std: float, log_q: int):
    from .encryption import generate_packing_keyswitch_key
    full = generate_packing_keyswitch_key(rng.key_from_seed(seed), in_sk,
                                          out_sk, decomp, noise_std, log_q)
    seeded = SeededLwePackingKeyswitchKey(
        bodies=full.data[..., -1, :], seed=seed, decomp=decomp,
        glwe_dimension=out_sk.glwe_dimension, log_q=log_q)
    return full, seeded


def decompress_packing_keyswitch_key(s: SeededLwePackingKeyswitchKey):
    """Replay generate_packing_keyswitch_key's single encrypt_glwe call over
    the [n_in, l, N] plaintext grid."""
    n_in, levels, n_poly = s.bodies.shape
    mask_key = rng.split(rng.key_from_seed(s.seed))[0]
    mask = rng.uniform_torus(mask_key,
                             (n_in, levels, s.glwe_dimension, n_poly), s.log_q)
    data = jnp.concatenate([mask, s.bodies[..., None, :]], axis=-2)
    return LwePackingKeyswitchKey(data=data, decomp=s.decomp)


# ---------------------------------------------------------------------------
# Public-key twins  (reference seeded_lwe_public_key.rs /
# seeded_lwe_compact_public_key.rs)
# ---------------------------------------------------------------------------


@struct.dataclass
class SeededLwePublicKey:
    bodies: Any        # [zero_count] — (n+1)·m limbs compress to m
    seed: int = _static(default=0)
    lwe_dimension: int = _static(default=0)
    log_q: int = _static(default=64)


def generate_seeded_lwe_public_key(seed: int, sk, zero_count: int,
                                   noise_std: float, log_q: int):
    from .public_key import LwePublicKey, generate_lwe_public_key
    full = generate_lwe_public_key(rng.key_from_seed(seed), sk, zero_count,
                                   noise_std, log_q)
    seeded = SeededLwePublicKey(bodies=full.data[..., -1], seed=seed,
                                lwe_dimension=sk.lwe_dimension, log_q=log_q)
    return full, seeded


def decompress_lwe_public_key(s: SeededLwePublicKey):
    """Replay generate_lwe_public_key's single encrypt_lwe over zero_count
    plaintexts."""
    from .public_key import LwePublicKey
    mask_key = rng.split(rng.key_from_seed(s.seed))[0]
    mask = rng.uniform_torus(mask_key,
                             (s.bodies.shape[0], s.lwe_dimension), s.log_q)
    data = jnp.concatenate([mask, s.bodies[..., None]], axis=-1)
    return LwePublicKey(data=data, log_q=s.log_q)


@struct.dataclass
class SeededLweCompactPublicKey:
    body: Any          # b(X) = a·s + e, [N]; a(X) replays from the seed
    seed: int = _static(default=0)
    log_q: int = _static(default=64)


def generate_seeded_compact_public_key(seed: int, sk, noise_std: float,
                                       log_q: int):
    from .public_key import generate_lwe_compact_public_key
    full = generate_lwe_compact_public_key(rng.key_from_seed(seed), sk,
                                           noise_std, log_q)
    seeded = SeededLweCompactPublicKey(body=full.data[1], seed=seed,
                                       log_q=log_q)
    return full, seeded


def decompress_compact_public_key(s: SeededLweCompactPublicKey):
    """Replay generate_lwe_compact_public_key's a(X) stream."""
    from .public_key import LweCompactPublicKey
    a_key = rng.split(rng.key_from_seed(s.seed))[0]
    a = rng.uniform_torus(a_key, (s.body.shape[-1],), s.log_q)
    return LweCompactPublicKey(data=jnp.stack([a, s.body]), log_q=s.log_q)
