"""Counter-based randomness for keys, masks and noise.

The reference uses a tree-forkable AES-CTR CSPRNG with explicit deterministic
fork maps so parallel key generation reproduces sequential output
(concrete-csprng/src/lib.rs:1-60, commons/generators/encryption/
mask_random_generator.rs:64-324).  On TPU we get the same property natively
from JAX's counter-based threefry PRNG: `jax.random.fold_in` derives
independent substreams from (key, index), so any parallel order yields
identical bits by construction.

Security note: threefry2x32 is not a vetted CSPRNG.  Client-side secret
material should be generated through `tfhe_tpu.utils.secure_seed`, which
seeds the tree from OS entropy (os.urandom); the native AES-CTR generator in
`tfhe_tpu/native/` can be swapped in for contexts that require AES-grade
streams.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .numeric import f32_to_torus_rounded, torus_dtype


def key_from_seed(seed: int):
    return jax.random.key(np.uint32(seed & 0xFFFFFFFF))


def fork(key, *indices):
    """Derive a deterministic substream; replaces the reference's fork maps."""
    for i in indices:
        key = jax.random.fold_in(key, i)
    return key


def split(key, n=2):
    return jax.random.split(key, n)


def uniform_torus(key, shape, log_q: int):
    """Uniform torus elements (the public mask part of ciphertexts)."""
    if log_q == 32:
        return jax.random.bits(key, shape, dtype=jnp.uint32)
    hi_lo = jax.random.bits(key, (2,) + tuple(shape), dtype=jnp.uint32).astype(jnp.uint64)
    return (hi_lo[0] << jnp.uint64(32)) | hi_lo[1]


def binary_key(key, shape):
    """Uniform binary secret key bits (as int8 0/1)."""
    return jax.random.bernoulli(key, 0.5, shape).astype(jnp.int8)


def gaussian_noise(key, shape, std: float, log_q: int):
    """Rounded gaussian on the torus with absolute std-dev `std` (units of q).

    Matches the reference's torus gaussian sampling
    (commons/math/random/gaussian.rs) up to rounding; f64 is used on CPU,
    a split-limb f32 path on accelerators without f64.
    """
    if std == 0.0:
        return jnp.zeros(shape, dtype=torus_dtype(log_q))
    if jax.default_backend() == "cpu":
        n = jax.random.normal(key, shape, dtype=jnp.float64) * np.float64(std)
        r = jnp.round(n)
        sdt = jnp.int64 if log_q == 64 else jnp.int32
        return r.astype(sdt).astype(torus_dtype(log_q))
    n = jax.random.normal(key, shape, dtype=jnp.float32) * np.float32(std)
    return f32_to_torus_rounded(n, log_q)
