"""Casting ciphertexts between shortint key sets.

Reference: tfhe/src/shortint/key_switching_key/ — a keyswitch key from key
set 1's encryption key to key set 2's, used e.g. by the Trivium
transciphering app to move stream-cipher bits into HLAPI parameters
(apps/trivium/src/trivium/trivium_shortint.rs:10-27).
"""
from __future__ import annotations

import flax.struct as struct

from ..core import rng
from ..core.algorithms import generate_keyswitch_key, keyswitch_lwe
from ..core.entities import LweKeyswitchKey
from ..core.params import ShortintKeySwitchingParameters
from .ciphertext import Ciphertext, NoiseLevel
from .client_key import LOG_Q, ClientKey


@struct.dataclass
class KeySwitchingKey:
    ksk: LweKeyswitchKey
    dest_params: object = struct.field(pytree_node=False)

    def cast(self, ct: Ciphertext) -> Ciphertext:
        """Move a ciphertext under key set 2 (reference cast_into)."""
        out = keyswitch_lwe(ct.lwe, self.ksk, LOG_Q)
        return Ciphertext(lwe=out, degree=ct.degree,
                          message_modulus=self.dest_params.message_modulus,
                          carry_modulus=self.dest_params.carry_modulus,
                          noise_level=NoiseLevel.NOMINAL)


def generate_key_switching_key(ck1: ClientKey, ck2: ClientKey,
                               params: ShortintKeySwitchingParameters,
                               seed: int = 0) -> KeySwitchingKey:
    key = rng.fork(rng.key_from_seed(seed), 0xC5)
    ksk = generate_keyswitch_key(key, ck1.encryption_key, ck2.encryption_key,
                                 params.ks_decomp,
                                 ck2.encryption_noise_std, LOG_Q)
    return KeySwitchingKey(ksk=ksk, dest_params=ck2.params)
