"""LWE public keys: standard (list-of-zeros) and compact (polynomial).

Reference: entities/lwe_public_key.rs + entities/lwe_compact_public_key.rs,
algorithms/lwe_encryption.rs (encrypt_lwe_ciphertext_with_public_key,
encrypt_lwe_ciphertext_with_compact_public_key :1684).

Standard PK: m encryptions of zero; public encryption adds a random binary
subset of them.  Compact PK (Joye et al.): a single (a(X), b(X) = a·s + e)
pair; a batch of ciphertexts comes from one random binary polynomial r via
negacyclic products, then per-coefficient LWE extraction.
"""
from __future__ import annotations

from typing import Any

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np

from .. import rng
from ..entities import LweCiphertext, LweSecretKey
from ..numeric import torus_dtype
from ..poly import negacyclic_polymul
from .encryption import encrypt_lwe


def _static(**kw):
    return struct.field(pytree_node=False, **kw)


@struct.dataclass
class LwePublicKey:
    """zero_count LWE encryptions of 0: data [m, n+1]."""

    data: Any
    log_q: int = _static(default=64)

    @property
    def zero_encryption_count(self) -> int:
        return self.data.shape[0]

    @property
    def lwe_dimension(self) -> int:
        return self.data.shape[-1] - 1


@struct.dataclass
class LweCompactPublicKey:
    """(a(X), b(X)) with b = a*s + e over Z_q[X]/(X^N+1); N = lwe_dimension."""

    data: Any          # [2, N]
    log_q: int = _static(default=64)

    @property
    def lwe_dimension(self) -> int:
        return self.data.shape[-1]


def generate_lwe_public_key(key, sk: LweSecretKey, zero_count: int,
                            noise_std: float, log_q: int) -> LwePublicKey:
    zeros = jnp.zeros((zero_count,), dtype=torus_dtype(log_q))
    ct = encrypt_lwe(key, sk, zeros, noise_std, log_q)
    return LwePublicKey(data=ct.data, log_q=log_q)


def encrypt_lwe_with_public_key(key, pk: LwePublicKey, plaintexts) -> LweCiphertext:
    """ct = Σ_{i ∈ random subset} pk_i + (0, m)."""
    dt = torus_dtype(pk.log_q)
    pts = jnp.asarray(plaintexts).astype(dt)
    sel = rng.binary_key(key, pts.shape + (pk.zero_encryption_count,))
    mask = jnp.where(sel[..., None] != 0, pk.data, jnp.zeros_like(pk.data))
    ct = mask.sum(axis=-2, dtype=dt)
    ct = ct.at[..., -1].add(pts)
    return LweCiphertext(data=ct)


def generate_lwe_compact_public_key(key, sk: LweSecretKey, noise_std: float,
                                    log_q: int) -> LweCompactPublicKey:
    """Requires power-of-two lwe_dimension (reference constraint)."""
    n = sk.lwe_dimension
    assert (n & (n - 1)) == 0, "compact PK needs power-of-two LWE dimension"
    a_key, e_key = rng.split(key)
    a = rng.uniform_torus(a_key, (n,), log_q)
    e = rng.gaussian_noise(e_key, (n,), noise_std, log_q)
    s = sk.bits.astype(jnp.int64)
    b = negacyclic_polymul(a, s, log_q,
                           log_bound=log_q + np.log2(n) + 1) + e
    return LweCompactPublicKey(data=jnp.stack([a, b]), log_q=log_q)


def encrypt_lwe_compact_batch(key, pk: LweCompactPublicKey, plaintexts,
                              noise_std: float):
    """Encrypt up to N plaintexts [..., m] with one binary r(X)
    (reference encrypt_lwe_ciphertext_with_compact_public_key).

    Returns LweCiphertext [..., m, n+1]; ciphertext i extracts coefficient i
    of (a·r + e1, b·r + e2 + Σ m_j X^j).
    """
    log_q = pk.log_q
    dt = torus_dtype(log_q)
    pts = jnp.asarray(plaintexts).astype(dt)
    m = pts.shape[-1]
    n = pk.lwe_dimension
    assert m <= n
    r_key, e1_key, e2_key = rng.split(key, 3)
    r = rng.binary_key(r_key, pts.shape[:-1] + (n,)).astype(jnp.int64)
    e1 = rng.gaussian_noise(e1_key, pts.shape[:-1] + (n,), noise_std, log_q)
    e2 = rng.gaussian_noise(e2_key, pts.shape[:-1] + (n,), noise_std, log_q)
    bound = log_q + np.log2(n) + 1
    # transpose trick: coefficient i of the extracted mask must be
    # a'(X) = a(X^-1)*r ... equivalently extract from the product directly.
    ct_mask_poly = negacyclic_polymul(pk.data[0], r, log_q, log_bound=bound) + e1
    body_poly = negacyclic_polymul(pk.data[1], r, log_q, log_bound=bound) + e2
    pad = jnp.zeros(pts.shape[:-1] + (n - m,), dtype=dt)
    body_poly = body_poly + jnp.concatenate([pts, pad], axis=-1)

    # extract LWE i: mask_j = ct_mask_poly[(i - j) mod n] * sign (negacyclic),
    # body = body_poly[i]  — same index math as glwe sample extraction.
    i_idx = jnp.arange(m)[:, None]
    j_idx = jnp.arange(n)[None, :]
    src = (i_idx - j_idx) % n
    sign_neg = j_idx > i_idx
    rows = ct_mask_poly[..., None, :]  # [..., 1, n]
    gathered = jnp.take_along_axis(
        jnp.broadcast_to(rows, pts.shape[:-1] + (m, n)),
        jnp.broadcast_to(src, pts.shape[:-1] + (m, n)), axis=-1)
    masks = jnp.where(sign_neg, -gathered, gathered)
    bodies = body_poly[..., :m]
    return LweCiphertext(data=jnp.concatenate([masks, bodies[..., None]], axis=-1))
