"""Encrypted Boolean gates.

Re-design of the reference `boolean` scheme (tfhe/src/boolean/): encoding
true = 1/8, false = -1/8 (boolean/mod.rs:76-80); a binary gate is a linear
combination followed by one sign-LUT PBS and a keyswitch
(boolean/engine/mod.rs:608-830, engine/bootstrapping.rs:257).

The torus width follows `params.log_q`.  The reference fixes u32
(boolean/mod.rs); here the named sets default to the 64-bit torus so gates
ride the fused Pallas blind-rotation kernel (which is 64-bit only — the
u32 accumulator travels as (hi, lo) planes).  The encoding is scale-free
(true/false are ±q/8 and noise is specified relative to q), so security
and correctness are unchanged; TEST_PARAMS_BOOLEAN keeps log_q=32 to
exercise the reference-width path on the XLA backend.

TPU-native differences: keys are pytrees, ciphertexts carry an arbitrary
batch shape, and every gate maps over the whole batch in one jitted program
(`server_key` is closed over, the batch axis shards across chips via
tfhe_tpu.parallel).
"""
from __future__ import annotations

from typing import Any

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..core.algorithms import (bootstrap_key_to_ntt, decrypt_lwe, encrypt_lwe,
                               external_product_num_primes,
                               generate_bootstrap_key, generate_glwe_secret_key,
                               generate_keyswitch_key, generate_lwe_secret_key,
                               keyswitch_lwe, programmable_bootstrap,
                               trivial_glwe, trivial_lwe)
from ..core.entities import (GlweCiphertext, LweCiphertext, LweKeyswitchKey,
                             LweSecretKey, NttLweBootstrapKey)
from ..core.numeric import to_signed, torus_dtype
from ..core.params import BooleanParameters, EncryptionKeyChoice, PBSOrder
from ..core.params import boolean_params as get_boolean_params

PLAINTEXT_LOG_SCALING_FACTOR = 3


def plaintext_true(params: BooleanParameters):
    """+1/8 of the torus (reference PLAINTEXT_TRUE, boolean/mod.rs:76)."""
    return torus_dtype(params.log_q)(1 << (params.log_q - 3))


def plaintext_false(params: BooleanParameters):
    """-1/8 of the torus."""
    return torus_dtype(params.log_q)(7 << (params.log_q - 3))


@struct.dataclass
class ClientKey:
    """Small LWE key + GLWE key (reference boolean::ClientKey)."""

    lwe_sk: LweSecretKey
    glwe_sk: Any
    params: BooleanParameters = struct.field(pytree_node=False)

    @property
    def encryption_key(self) -> LweSecretKey:
        if self.params.encryption_key_choice == EncryptionKeyChoice.SMALL:
            return self.lwe_sk
        return self.glwe_sk.as_lwe_secret_key()


@struct.dataclass
class ServerKey:
    """NTT-domain bootstrap key + keyswitch key
    (reference boolean/engine/bootstrapping.rs:93)."""

    bsk: NttLweBootstrapKey
    ksk: LweKeyswitchKey
    params: BooleanParameters = struct.field(pytree_node=False)


@struct.dataclass
class BoolCiphertext:
    """Batch of encrypted booleans; data [..., n+1] torus words."""

    lwe: LweCiphertext

    @property
    def batch_shape(self):
        return self.lwe.batch_shape


def gen_keys(params: BooleanParameters | str = "DEFAULT_PARAMETERS", seed: int = 0):
    """Generate (ClientKey, ServerKey) — reference boolean::gen_keys."""
    if isinstance(params, str):
        params = get_boolean_params(params)
    root = rng.key_from_seed(seed)
    k_lwe, k_glwe, k_bsk, k_ksk = rng.split(root, 4)
    lwe_sk = generate_lwe_secret_key(k_lwe, params.lwe_dimension)
    glwe_sk = generate_glwe_secret_key(k_glwe, params.glwe_dimension,
                                       params.polynomial_size)
    ck = ClientKey(lwe_sk=lwe_sk, glwe_sk=glwe_sk, params=params)
    sk = gen_server_key(ck, k_bsk, k_ksk)
    return ck, sk


def gen_server_key(ck: ClientKey, k_bsk, k_ksk) -> ServerKey:
    params = ck.params
    bsk_std = generate_bootstrap_key(k_bsk, ck.lwe_sk, ck.glwe_sk,
                                     params.pbs_decomp, params.glwe_noise_std,
                                     params.log_q)
    num_primes = external_product_num_primes(
        params.polynomial_size, params.glwe_size, params.pbs_decomp,
        params.log_q)
    bsk = bootstrap_key_to_ntt(bsk_std, params.log_q, num_primes)
    ksk = generate_keyswitch_key(
        k_ksk, ck.glwe_sk.as_lwe_secret_key(), ck.lwe_sk,
        params.ks_decomp, params.lwe_noise_std, params.log_q)
    return ServerKey(bsk=bsk, ksk=ksk, params=params)


# ---------------------------------------------------------------------------
# encryption
# ---------------------------------------------------------------------------


def encrypt(ck: ClientKey, messages, seed: int = 0) -> BoolCiphertext:
    """messages: bool array [...] → BoolCiphertext batch."""
    msgs = jnp.asarray(messages, dtype=bool)
    pts = jnp.where(msgs, plaintext_true(ck.params), plaintext_false(ck.params))
    key = rng.fork(rng.key_from_seed(seed), 1)
    ct = encrypt_lwe(key, ck.encryption_key, pts,
                     _fresh_noise_std(ck.params), ck.params.log_q)
    return BoolCiphertext(lwe=ct)


def _fresh_noise_std(params: BooleanParameters) -> float:
    if params.encryption_key_choice == EncryptionKeyChoice.SMALL:
        return params.lwe_noise_std
    return params.glwe_noise_std


@struct.dataclass
class CompressedCiphertext:
    """Seeded boolean ciphertext: body + mask seed only (reference
    boolean CompressedCiphertext, boolean/ciphertext/mod.rs)."""

    seeded: Any
    params: BooleanParameters = struct.field(pytree_node=False, default=None)

    def decompress(self) -> BoolCiphertext:
        from ..core.algorithms.seeded import decompress_lwe
        return BoolCiphertext(lwe=decompress_lwe(self.seeded))


def encrypt_compressed(ck: ClientKey, messages, seed: int = 1) -> CompressedCiphertext:
    """reference ClientKey::encrypt_compressed — the mask regenerates from
    the seed at decompression, so the wire size is one torus word per bool."""
    from ..core.algorithms.seeded import encrypt_lwe_seeded
    msgs = jnp.asarray(messages, dtype=bool)
    pts = jnp.where(msgs, plaintext_true(ck.params), plaintext_false(ck.params))
    seeded = encrypt_lwe_seeded(seed, ck.encryption_key, pts,
                                _fresh_noise_std(ck.params), ck.params.log_q)
    return CompressedCiphertext(seeded=seeded, params=ck.params)


def trivial_encrypt(params: BooleanParameters, messages) -> BoolCiphertext:
    msgs = jnp.asarray(messages, dtype=bool)
    pts = jnp.where(msgs, plaintext_true(params), plaintext_false(params))
    n = (params.lwe_dimension
         if params.encryption_key_choice == EncryptionKeyChoice.SMALL
         else params.big_lwe_dimension)
    return BoolCiphertext(lwe=trivial_lwe(pts, n, params.log_q))


def decrypt(ck: ClientKey, ct: BoolCiphertext):
    """→ bool array [...]: true iff the phase lies in the positive half."""
    phase = decrypt_lwe(ct.lwe, ck.encryption_key, ck.params.log_q)
    return to_signed(phase, ck.params.log_q) > 0


# ---------------------------------------------------------------------------
# the bootstrapping pattern
# ---------------------------------------------------------------------------


def _sign_accumulator(params: BooleanParameters) -> GlweCiphertext:
    """Trivial GLWE accumulator with all body coefficients = 1/8
    (reference engine/bootstrapping.rs:59-60)."""
    body = jnp.full((params.polynomial_size,), plaintext_true(params),
                    dtype=torus_dtype(params.log_q))
    return trivial_glwe(body, params.glwe_dimension, params.log_q)


def _apply_bootstrapping_pattern(sk: ServerKey, lwe: LweCiphertext) -> LweCiphertext:
    """KS→PBS or PBS→KS per parameter choice
    (reference apply_bootstrapping_pattern, engine/bootstrapping.rs:392)."""
    acc = _sign_accumulator(sk.params)
    log_q = sk.params.log_q
    if sk.params.pbs_order == PBSOrder.KEYSWITCH_BOOTSTRAP:
        small = keyswitch_lwe(lwe, sk.ksk, log_q)
        return programmable_bootstrap(small, acc, sk.bsk, log_q)
    big = programmable_bootstrap(lwe, acc, sk.bsk, log_q)
    return keyswitch_lwe(big, sk.ksk, log_q)


def _gate(sk: ServerKey, combo: LweCiphertext) -> BoolCiphertext:
    return BoolCiphertext(lwe=_apply_bootstrapping_pattern(sk, combo))


# ---------------------------------------------------------------------------
# gates (linear combinations per reference boolean/engine/mod.rs:608-830)
# ---------------------------------------------------------------------------


def and_(sk: ServerKey, a: BoolCiphertext, b: BoolCiphertext) -> BoolCiphertext:
    data = a.lwe.data + b.lwe.data
    data = data.at[..., -1].add(plaintext_false(sk.params))   # - 1/8
    return _gate(sk, LweCiphertext(data=data))


def nand(sk: ServerKey, a: BoolCiphertext, b: BoolCiphertext) -> BoolCiphertext:
    data = -(a.lwe.data + b.lwe.data)
    data = data.at[..., -1].add(plaintext_true(sk.params))    # + 1/8
    return _gate(sk, LweCiphertext(data=data))


def or_(sk: ServerKey, a: BoolCiphertext, b: BoolCiphertext) -> BoolCiphertext:
    data = a.lwe.data + b.lwe.data
    data = data.at[..., -1].add(plaintext_true(sk.params))    # + 1/8
    return _gate(sk, LweCiphertext(data=data))


def nor(sk: ServerKey, a: BoolCiphertext, b: BoolCiphertext) -> BoolCiphertext:
    data = -(a.lwe.data + b.lwe.data)
    data = data.at[..., -1].add(plaintext_false(sk.params))   # - 1/8
    return _gate(sk, LweCiphertext(data=data))


def xor_(sk: ServerKey, a: BoolCiphertext, b: BoolCiphertext) -> BoolCiphertext:
    data = a.lwe.data + b.lwe.data
    data = data.at[..., -1].add(plaintext_true(sk.params))
    data = data * torus_dtype(sk.params.log_q)(2)         # 2*(a + b + 1/8)
    return _gate(sk, LweCiphertext(data=data))


xor = xor_   # `xor` is not a Python keyword — offer the reference's name too


def xnor(sk: ServerKey, a: BoolCiphertext, b: BoolCiphertext) -> BoolCiphertext:
    data = a.lwe.data + b.lwe.data
    data = data.at[..., -1].add(plaintext_true(sk.params))
    data = -data * torus_dtype(sk.params.log_q)(2)        # 2*(-(a + b) - 1/8)
    return _gate(sk, LweCiphertext(data=data))


def not_(a: BoolCiphertext) -> BoolCiphertext:
    """Negation is linear — no PBS (reference engine/mod.rs `not`)."""
    return BoolCiphertext(lwe=LweCiphertext(data=-a.lwe.data))


def mux(sk: ServerKey, cond: BoolCiphertext, then_ct: BoolCiphertext,
        else_ct: BoolCiphertext) -> BoolCiphertext:
    """(cond AND then) + (NOT cond AND else): two PBS + linear recombination
    (reference engine/mod.rs:461-570)."""
    log_q = sk.params.log_q
    c1 = cond.lwe.data + then_ct.lwe.data
    c1 = c1.at[..., -1].add(plaintext_false(sk.params))
    c2 = -cond.lwe.data + else_ct.lwe.data
    c2 = c2.at[..., -1].add(plaintext_false(sk.params))

    acc = _sign_accumulator(sk.params)
    if sk.params.pbs_order == PBSOrder.KEYSWITCH_BOOTSTRAP:
        p1 = programmable_bootstrap(keyswitch_lwe(LweCiphertext(c1), sk.ksk, log_q),
                                    acc, sk.bsk, log_q)
        p2 = programmable_bootstrap(keyswitch_lwe(LweCiphertext(c2), sk.ksk, log_q),
                                    acc, sk.bsk, log_q)
        out = p1.data + p2.data
        out = out.at[..., -1].add(plaintext_true(sk.params))
        return BoolCiphertext(lwe=LweCiphertext(data=out))
    p1 = programmable_bootstrap(LweCiphertext(c1), acc, sk.bsk, log_q)
    p2 = programmable_bootstrap(LweCiphertext(c2), acc, sk.bsk, log_q)
    out = p1.data + p2.data
    out = out.at[..., -1].add(plaintext_true(sk.params))
    return BoolCiphertext(lwe=keyswitch_lwe(LweCiphertext(data=out), sk.ksk, log_q))


# ---------------------------------------------------------------------------
# public keys (reference boolean/public_key/)
# ---------------------------------------------------------------------------


@struct.dataclass
class PublicKey:
    """List-of-zero-encryptions public key for the boolean scheme."""

    pk: Any
    params: BooleanParameters = struct.field(pytree_node=False)


def gen_public_key(ck: ClientKey, zero_count: int = None, seed: int = 0) -> PublicKey:
    from ..core.algorithms.public_key import generate_lwe_public_key
    n = ck.encryption_key.lwe_dimension
    zero_count = zero_count or (2 * n)
    key = rng.fork(rng.key_from_seed(seed), 0xB0B)
    pk = generate_lwe_public_key(key, ck.encryption_key, zero_count,
                                 _fresh_noise_std(ck.params), ck.params.log_q)
    return PublicKey(pk=pk, params=ck.params)


def encrypt_with_public_key(pk: PublicKey, messages, seed: int = 0) -> BoolCiphertext:
    from ..core.algorithms.public_key import encrypt_lwe_with_public_key
    msgs = jnp.asarray(messages, dtype=bool)
    pts = jnp.where(msgs, plaintext_true(pk.params), plaintext_false(pk.params))
    key = rng.fork(rng.key_from_seed(seed), 0xB0C)
    ct = encrypt_lwe_with_public_key(key, pk.pk, pts)
    return BoolCiphertext(lwe=ct)


# ---------------------------------------------------------------------------
# casting between boolean key sets (reference boolean/key_switching_key/)
# ---------------------------------------------------------------------------


@struct.dataclass
class BooleanKeySwitchingKey:
    ksk: LweKeyswitchKey
    dest_params: BooleanParameters = struct.field(pytree_node=False)

    def cast(self, ct: BoolCiphertext) -> BoolCiphertext:
        return BoolCiphertext(
            lwe=keyswitch_lwe(ct.lwe, self.ksk, self.dest_params.log_q))


def gen_key_switching_key(ck1: ClientKey, ck2: ClientKey, ks_base_log: int = 2,
                          ks_level: int = 8, seed: int = 0) -> BooleanKeySwitchingKey:
    from ..core.params import DecompParams
    key = rng.fork(rng.key_from_seed(seed), 0xB5C)
    ksk = generate_keyswitch_key(key, ck1.encryption_key, ck2.encryption_key,
                                 DecompParams(ks_base_log, ks_level),
                                 _fresh_noise_std(ck2.params), ck2.params.log_q)
    return BooleanKeySwitchingKey(ksk=ksk, dest_params=ck2.params)


# ---------------------------------------------------------------------------
# compressed (seeded) server & public keys
# (reference boolean/server_key/mod.rs CompressedServerKey,
#  boolean/public_key/compressed.rs CompressedPublicKey)
# ---------------------------------------------------------------------------


@struct.dataclass
class CompressedServerKey:
    """Seed + bodies only: the BSK's GGSW masks and the KSK's LWE masks
    regenerate deterministically from the stored seeds on decompression
    ((k+1)x / (n+1)x smaller on the wire)."""

    seeded_bsk: Any
    seeded_ksk: Any
    params: BooleanParameters = struct.field(pytree_node=False, default=None)

    def decompress(self) -> ServerKey:
        from ..core.algorithms.seeded import (decompress_bootstrap_key,
                                              decompress_keyswitch_key)
        p = self.params
        bsk_std = decompress_bootstrap_key(self.seeded_bsk)
        num_primes = external_product_num_primes(
            p.polynomial_size, p.glwe_size, p.pbs_decomp, p.log_q)
        bsk = bootstrap_key_to_ntt(bsk_std, p.log_q, num_primes)
        ksk = decompress_keyswitch_key(self.seeded_ksk)
        return ServerKey(bsk=bsk, ksk=ksk, params=p)


def gen_compressed_server_key(ck: ClientKey, seed: int = 0) -> CompressedServerKey:
    """Compressed twin of gen_server_key (reference
    boolean::CompressedServerKey::new)."""
    from ..core.algorithms.seeded import (generate_seeded_bootstrap_key,
                                          generate_seeded_keyswitch_key)
    p = ck.params
    _, seeded_bsk = generate_seeded_bootstrap_key(
        seed * 2 + 0xB001, ck.lwe_sk, ck.glwe_sk, p.pbs_decomp,
        p.glwe_noise_std, p.log_q)
    _, seeded_ksk = generate_seeded_keyswitch_key(
        seed * 2 + 0xB002, ck.glwe_sk.as_lwe_secret_key(), ck.lwe_sk,
        p.ks_decomp, p.lwe_noise_std, p.log_q)
    return CompressedServerKey(seeded_bsk=seeded_bsk, seeded_ksk=seeded_ksk,
                               params=p)


@struct.dataclass
class CompressedPublicKey:
    """Seeded list-of-zero-encryptions public key (reference
    boolean/public_key/compressed.rs): stores bodies + the mask seed."""

    seeded: Any
    params: BooleanParameters = struct.field(pytree_node=False, default=None)

    def decompress(self) -> PublicKey:
        from ..core.algorithms.seeded import decompress_lwe_public_key
        return PublicKey(pk=decompress_lwe_public_key(self.seeded),
                         params=self.params)


def gen_compressed_public_key(ck: ClientKey, zero_count: int = None,
                              seed: int = 0) -> CompressedPublicKey:
    from ..core.algorithms.seeded import generate_seeded_lwe_public_key
    n = ck.encryption_key.lwe_dimension
    zero_count = zero_count or (2 * n)
    _, seeded = generate_seeded_lwe_public_key(
        seed * 2 + 0xB003, ck.encryption_key, zero_count,
        _fresh_noise_std(ck.params), ck.params.log_q)
    return CompressedPublicKey(seeded=seeded, params=ck.params)
