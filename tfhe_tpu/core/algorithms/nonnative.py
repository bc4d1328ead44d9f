"""LWE algorithms under a non-native (arbitrary) ciphertext modulus q.

Reference surface (tfhe-rs 0.5): `CiphertextModulus::Custom` handling in
`core_crypto/algorithms/lwe_encryption.rs`
(`fill_lwe_mask_and_body_for_encryption_other_mod`, :148-163),
`lwe_linear_algebra.rs` (`lwe_ciphertext_add_assign_other_mod`, :105;
`..._plaintext_add_assign_other_mod`, :314), the seeded decompression twins,
and `SignedDecomposerNonNative`
(`commons/math/decomposition/decomposer.rs:203-410`, iterator in `iter.rs:
237-282`, summand in `term.rs:140-156`).

Representation: ciphertext limbs are u64 arrays holding values in [0, q).
(The reference stores non-native *power-of-two* moduli shifted to the top
bits so native wrapping ops work; here every custom modulus — power of two
or odd — goes through the same mod-q arithmetic, which is the simpler
equivalent on this side since these are cold, client/CPU-side paths.  The
hot TPU paths all run at the native 2^32/2^64 or 2^128 moduli.)

All functions are pure and batched: ciphertexts are [..., n+1] u64 arrays
mirroring the native-layer `LweCiphertext` layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import rng
from ..entities import LweCiphertext, LweSecretKey

_U64 = jnp.uint64


def _check_q(q: int):
    assert 1 < q < (1 << 64), "custom modulus must fit u64"


def uniform_mod(key, shape, q: int):
    """Uniform values in [0, q): 128 PRNG bits reduced mod q (bias 2^-64,
    far below any dispersion here).  Exact host-side reduction — custom-mod
    paths are cold client-side operations by design (module docstring)."""
    hi = np.asarray(jax.random.bits(key, shape, dtype=_U64))
    lo = np.asarray(jax.random.bits(jax.random.fold_in(key, 1), shape,
                                    dtype=_U64))
    x = (hi.astype(object) << 64) | lo.astype(object)
    return jnp.asarray((x % q).astype(np.uint64))


def gaussian_mod(key, shape, rel_std: float, q: int):
    """Rounded gaussian with std-dev `rel_std`·q, reduced into [0, q)
    (reference random_noise_custom_mod: torus gaussian scaled by the custom
    modulus)."""
    if rel_std == 0.0:
        return jnp.zeros(shape, dtype=_U64)
    n = jax.random.normal(key, shape, dtype=jnp.float64) * (rel_std * q)
    r = jnp.round(n).astype(jnp.int64)
    rw = r.astype(_U64)               # negative r wraps to 2^64 + r
    return jnp.where(r < 0, rw + _U64(q), rw)  # ... + q wraps back to q + r


def add_mod(a, b, q: int):
    s = a + jnp.asarray(b, dtype=_U64)
    return jnp.where(s >= _U64(q), s - _U64(q), s)


def sub_mod(a, b, q: int):
    b = jnp.asarray(b, dtype=_U64)
    return jnp.where(a >= b, a - b, a + _U64(q) - b)


def neg_mod(a, q: int):
    return jnp.where(a == 0, a, _U64(q) - a)


def mul_scalar_mod(a, c: int, q: int):
    """a·c mod q for a cleartext scalar c — exact for any q < 2^64 via
    host-side 128-bit object arithmetic (cold path, see module docstring)."""
    av = np.asarray(a).astype(object)
    return jnp.asarray(((av * (int(c) % q)) % q).astype(np.uint64))


def _dot_key_mod(mask, key_bits, q: int):
    """Σ a_i·s_i mod q over the last axis (binary key: a masked sum)."""
    sel = jnp.where(key_bits.astype(jnp.uint8) != 0, mask, _U64(0))
    q64 = _U64(q)

    def body(acc, a):
        s = acc + a
        return jnp.where(s >= q64, s - q64, s), None

    acc, _ = jax.lax.scan(body, jnp.zeros(mask.shape[:-1], _U64),
                          jnp.moveaxis(sel, -1, 0))
    return acc


def encrypt_lwe_custom_mod(key, sk: LweSecretKey, plaintexts, rel_std: float,
                           q: int) -> LweCiphertext:
    """Encrypt torus-of-Z_q plaintexts [..., ] under modulus q
    (reference fill_lwe_mask_and_body_for_encryption_other_mod,
    lwe_encryption.rs:148-163)."""
    _check_q(q)
    pts = jnp.asarray(plaintexts).astype(_U64) % _U64(q)
    n = sk.lwe_dimension
    mask_key, noise_key = rng.split(key)
    mask = uniform_mod(mask_key, pts.shape + (n,), q)
    noise = gaussian_mod(noise_key, pts.shape, rel_std, q)
    body = add_mod(add_mod(_dot_key_mod(mask, sk.bits, q), pts, q), noise, q)
    return LweCiphertext(data=jnp.concatenate([mask, body[..., None]], axis=-1))


def decrypt_lwe_custom_mod(ct: LweCiphertext, sk: LweSecretKey, q: int):
    """Phase b − <a, s> mod q."""
    _check_q(q)
    return sub_mod(ct.body, _dot_key_mod(ct.mask, sk.bits, q), q)


def lwe_add_custom_mod(a: LweCiphertext, b: LweCiphertext, q: int) -> LweCiphertext:
    """reference lwe_ciphertext_add_assign_other_mod (lwe_linear_algebra.rs:105)."""
    return LweCiphertext(data=add_mod(a.data, b.data, q))


def lwe_sub_custom_mod(a: LweCiphertext, b: LweCiphertext, q: int) -> LweCiphertext:
    return LweCiphertext(data=sub_mod(a.data, b.data, q))


def lwe_neg_custom_mod(a: LweCiphertext, q: int) -> LweCiphertext:
    return LweCiphertext(data=neg_mod(a.data, q))


def lwe_plaintext_add_custom_mod(a: LweCiphertext, pt, q: int) -> LweCiphertext:
    """reference lwe_ciphertext_plaintext_add_assign_other_mod (:314)."""
    body = add_mod(a.body, jnp.asarray(pt).astype(_U64) % _U64(q), q)
    return LweCiphertext(
        data=jnp.concatenate([a.mask, body[..., None]], axis=-1))


def lwe_cleartext_mul_custom_mod(a: LweCiphertext, c: int, q: int) -> LweCiphertext:
    return LweCiphertext(data=mul_scalar_mod(a.data, c, q))


def encrypt_seeded_lwe_custom_mod(key, sk: LweSecretKey, plaintexts,
                                  rel_std: float, q: int):
    """Seeded twin: returns (mask_key_token, bodies).  The mask stream is
    replayed from the fork of `key`, never stored (reference seeded LWE +
    seeded_lwe_ciphertext_decompression under custom modulus)."""
    _check_q(q)
    pts = jnp.asarray(plaintexts).astype(_U64) % _U64(q)
    mask_key, noise_key = rng.split(key)
    mask = uniform_mod(mask_key, pts.shape + (sk.lwe_dimension,), q)
    noise = gaussian_mod(noise_key, pts.shape, rel_std, q)
    body = add_mod(add_mod(_dot_key_mod(mask, sk.bits, q), pts, q), noise, q)
    return body


def decompress_seeded_lwe_custom_mod(key, bodies, lwe_dimension: int, q: int
                                     ) -> LweCiphertext:
    """Re-expand the mask from the seed fork and attach the stored bodies."""
    _check_q(q)
    mask_key, _ = rng.split(key)
    bodies = jnp.asarray(bodies).astype(_U64)
    mask = uniform_mod(mask_key, bodies.shape + (lwe_dimension,), q)
    return LweCiphertext(
        data=jnp.concatenate([mask, bodies[..., None]], axis=-1))


# ---------------------------------------------------------------------------
# SignedDecomposerNonNative (decomposer.rs:203, iter.rs:237, term.rs:140)
# ---------------------------------------------------------------------------


def closest_representable_custom_mod(x, base_log: int, level: int, q: int):
    """round(x / (q/B^l)) · (q/B^l), floored-radix form — exactly the
    reference's closest_representable (decomposer.rs:341-357, with
    divide_round_to_u128_custom_mod from algorithms/misc.rs:31)."""
    _check_q(q)
    sr = q // (1 << (base_log * level))          # smallest representable
    x = jnp.asarray(x).astype(_U64)
    rounded = ((x + _U64(sr >> 1)) % _U64(q)) // _U64(sr)
    return rounded * _U64(sr)                    # u64 wrap == reference cast


def decompose_custom_mod(x, base_log: int, level: int, q: int):
    """Balanced signed decomposition of x under modulus q.

    Returns terms [..., level] ordered level l..1 (matching the reference
    iterator's decreasing-level order): each term is θ_i represented in
    [0, q) with |θ_i|_centered ≤ B/2 (iter.rs decompose_one_level_non_native,
    :268-282)."""
    _check_q(q)
    b = base_log
    mod_b_mask = _U64((1 << b) - 1)
    sr = q // (1 << (b * level))
    x = jnp.asarray(x).astype(_U64)
    rounded = ((x + _U64(sr >> 1)) % _U64(q)) // _U64(sr)
    state = rounded
    terms = []
    for _ in range(level):
        res = state & mod_b_mask
        state = state >> _U64(b)
        carry = ((res - _U64(1)) | state) & res
        carry = carry >> _U64(b - 1)
        state = state + carry
        terms.append((res + _U64(q) - (carry << _U64(b))) % _U64(q))
    return jnp.stack(terms, axis=-1)


def recomposition_summands_custom_mod(terms, base_log: int, level: int, q: int):
    """θ_i · floor(q / B^i) for terms ordered level l..1
    (term.rs to_recomposition_summand, :146-155).  Summing these mod q
    approximates closest_representable(x) to within l·B/2 (floored radices)."""
    out = []
    for k in range(level):
        lvl = level - k
        radix = q // (1 << (base_log * lvl))
        out.append(mul_scalar_mod(terms[..., k], radix, q))
    return jnp.stack(out, axis=-1)
