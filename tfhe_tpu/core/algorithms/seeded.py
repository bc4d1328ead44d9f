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
from ..entities import (GlweCiphertext, LweBootstrapKey, LweCiphertext,
                        LweKeyswitchKey)
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


def bsk_masks_from_seed(seed: int, n_in: int, levels: int, glwe_size: int,
                        n_poly: int, log_q: int):
    """Replay the public mask stream of `generate_bootstrap_key` WITHOUT any
    secret material (masks are drawn before secrets touch the data).  Must
    stay in lockstep with the key-fork structure of
    encryption.generate_bootstrap_key / encrypt_constant_ggsw / encrypt_glwe.
    """
    k = glwe_size - 1
    root = rng.key_from_seed(seed)
    keys = rng.split(root, n_in)                       # per input bit

    def per_bit(subkey):
        row_keys = rng.split(subkey, levels * glwe_size)

        def per_row(rk):
            mask_key = rng.split(rk)[0]
            return rng.uniform_torus(mask_key, (k, n_poly), log_q)

        return jax.vmap(per_row)(row_keys).reshape(levels, glwe_size, k, n_poly)

    return jax.vmap(per_bit)(keys)                     # [n, l, k+1, k, N]


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
