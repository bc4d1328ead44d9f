"""Shortint client key: encrypt/decrypt under the big (GLWE-as-LWE) key
(reference shortint/client_key/mod.rs)."""
from __future__ import annotations

from typing import Any

import flax.struct as struct
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..core.algorithms import (decrypt_lwe, encrypt_lwe,
                               generate_glwe_secret_key,
                               generate_lwe_secret_key, trivial_lwe)
from ..core.entities import GlweSecretKey, LweSecretKey
from ..core.params import (ClassicPBSParameters, EncryptionKeyChoice,
                           shortint_params)
from .ciphertext import Ciphertext, NoiseLevel

LOG_Q = 64


def delta_for(params) -> np.uint64:
    """Δ = q / (2 * msg_mod * carry_mod) — one bit of padding."""
    space = 2 * params.message_modulus * params.carry_modulus
    return np.uint64((1 << 64) // space)


@struct.dataclass
class ClientKey:
    glwe_sk: GlweSecretKey
    lwe_sk: LweSecretKey
    params: ClassicPBSParameters = struct.field(pytree_node=False)

    @property
    def big_sk(self) -> LweSecretKey:
        return self.glwe_sk.as_lwe_secret_key()

    @property
    def encryption_key(self) -> LweSecretKey:
        if self.params.encryption_key_choice == EncryptionKeyChoice.BIG:
            return self.big_sk
        return self.lwe_sk

    @property
    def encryption_noise_std(self) -> float:
        if self.params.encryption_key_choice == EncryptionKeyChoice.BIG:
            return self.params.glwe_noise_std
        return self.params.lwe_noise_std

    def encrypt(self, messages, seed: int = 0) -> Ciphertext:
        """messages: uint array [...] in [0, message_modulus)."""
        p = self.params
        msgs = jnp.asarray(messages).astype(jnp.uint64) % jnp.uint64(
            p.message_modulus * p.carry_modulus)
        pts = msgs * delta_for(p)
        key = rng.fork(rng.key_from_seed(seed), 0x5C)
        ct = encrypt_lwe(key, self.encryption_key, pts,
                         self.encryption_noise_std, LOG_Q)
        return Ciphertext(lwe=ct, degree=p.message_modulus - 1,
                          message_modulus=p.message_modulus,
                          carry_modulus=p.carry_modulus,
                          noise_level=NoiseLevel.NOMINAL)

    def unchecked_encrypt(self, messages, seed: int = 0) -> Ciphertext:
        """Encrypt into the full message+carry space (degree = 2p-1)."""
        p = self.params
        ct = self.encrypt(messages, seed)
        return ct.with_(degree=p.message_modulus * p.carry_modulus - 1)

    def decrypt(self, ct: Ciphertext):
        """→ message array [...] (mod message_modulus)."""
        return self.decrypt_message_and_carry(ct) % np.uint64(ct.message_modulus)

    def decrypt_message_and_carry(self, ct: Ciphertext):
        phase = decrypt_lwe(ct.lwe, self.encryption_key, LOG_Q)
        d = delta_for(self.params)
        space = np.uint64(2 * self.params.message_modulus * self.params.carry_modulus)
        return ((phase + (d >> np.uint64(1))) // d) % space

    def encrypt_compressed(self, messages, seed: int = 1):
        """Seeded encryption: ships only the bodies + a 32-bit seed
        (reference ClientKey::encrypt_compressed -> CompressedCiphertext,
        shortint/ciphertext/mod.rs:471-494)."""
        from ..core.algorithms.seeded import encrypt_lwe_seeded
        from .ciphertext import CompressedCiphertext
        p = self.params
        msgs = jnp.asarray(messages).astype(jnp.uint64) % jnp.uint64(
            p.message_modulus * p.carry_modulus)
        pts = msgs * delta_for(p)
        sct = encrypt_lwe_seeded(seed, self.encryption_key, pts,
                                 self.encryption_noise_std, LOG_Q)
        return CompressedCiphertext(
            ct=sct, degree=p.message_modulus - 1,
            message_modulus=p.message_modulus, carry_modulus=p.carry_modulus,
            noise_level=NoiseLevel.NOMINAL)

    def decrypt_compressed(self, cct):
        return self.decrypt(cct.decompress())

    def trivial_encrypt(self, messages, degree=None) -> Ciphertext:
        p = self.params
        msgs = jnp.asarray(messages).astype(jnp.uint64)
        pts = msgs * delta_for(p)
        n = (p.big_lwe_dimension
             if p.encryption_key_choice == EncryptionKeyChoice.BIG
             else p.lwe_dimension)
        return Ciphertext(lwe=trivial_lwe(pts, n, LOG_Q),
                          degree=p.message_modulus - 1 if degree is None else degree,
                          message_modulus=p.message_modulus,
                          carry_modulus=p.carry_modulus,
                          noise_level=NoiseLevel.ZERO)


def gen_keys(params="PARAM_MESSAGE_2_CARRY_2_KS_PBS", seed: int = 0):
    """→ (ClientKey, ServerKey) — reference shortint::gen_keys."""
    from .server_key import gen_server_key
    if isinstance(params, str):
        params = shortint_params(params)
    root = rng.key_from_seed(seed)
    k_glwe, k_lwe, k_srv = rng.split(root, 3)
    glwe_sk = generate_glwe_secret_key(k_glwe, params.glwe_dimension,
                                       params.polynomial_size)
    lwe_sk = generate_lwe_secret_key(k_lwe, params.lwe_dimension)
    ck = ClientKey(glwe_sk=glwe_sk, lwe_sk=lwe_sk, params=params)
    return ck, gen_server_key(ck, k_srv)
