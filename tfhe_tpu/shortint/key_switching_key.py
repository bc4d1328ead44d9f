"""Casting ciphertexts between shortint key sets.

Reference: tfhe/src/shortint/key_switching_key/ — a keyswitch key from key
set 1's encryption key to key set 2's, used e.g. by the Trivium
transciphering app to move stream-cipher bits into HLAPI parameters
(apps/trivium/src/trivium/trivium_shortint.rs:10-27).

When the two sets have different total plaintext widths the torus scaling
differs (delta_src = 2^r * delta_dst); `cast` compensates with a shift LUT
exactly like the reference's `cast_rshift` branches
(shortint/key_switching_key/mod.rs:113-145).
"""
from __future__ import annotations

from typing import Any

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
    # log2(dst total space) - log2(src total space); the torus value of a
    # message v under src params reads as v << cast_rshift under dst params
    dest_params: object = struct.field(pytree_node=False)
    cast_rshift: int = struct.field(pytree_node=False, default=0)
    # server keys for the shift LUTs (None is fine when cast_rshift == 0)
    dest_server_key: Any = None
    src_server_key: Any = None

    def cast(self, ct: Ciphertext) -> Ciphertext:
        """Move a ciphertext under key set 2 (reference cast_into,
        shortint/key_switching_key/mod.rs:113)."""
        r = self.cast_rshift
        if r == 0:
            out = keyswitch_lwe(ct.lwe, self.ksk, LOG_Q)
            return Ciphertext(lwe=out, degree=ct.degree,
                              message_modulus=self.dest_params.message_modulus,
                              carry_modulus=self.dest_params.carry_modulus,
                              noise_level=NoiseLevel.NOMINAL)
        if r > 0:
            # cast to a bigger space: keyswitch, then n >> r under dest key
            out = keyswitch_lwe(ct.lwe, self.ksk, LOG_Q)
            mid = Ciphertext(lwe=out, degree=ct.degree << r,
                             message_modulus=self.dest_params.message_modulus,
                             carry_modulus=self.dest_params.carry_modulus,
                             noise_level=NoiseLevel.UNKNOWN)
            sk = self.dest_server_key
            lut = sk.generate_lookup_table(lambda n: n >> r)
            res = sk.apply_lookup_table(mid, lut)
            return res.with_(degree=ct.degree)
        # cast to a smaller space: (n << -r) mod src total under src key,
        # then keyswitch
        sk = self.src_server_key
        total = ct.message_modulus * ct.carry_modulus
        lut = sk.generate_lookup_table(lambda n: (n << -r) % total)
        shifted = sk.apply_lookup_table(ct, lut)
        out = keyswitch_lwe(shifted.lwe, self.ksk, LOG_Q)
        return Ciphertext(lwe=out, degree=ct.degree,
                          message_modulus=self.dest_params.message_modulus,
                          carry_modulus=self.dest_params.carry_modulus,
                          noise_level=NoiseLevel.NOMINAL)


def generate_key_switching_key(ck1: ClientKey, ck2: ClientKey,
                               params: ShortintKeySwitchingParameters,
                               seed: int = 0, src_server_key=None,
                               dest_server_key=None) -> KeySwitchingKey:
    """Reference KeySwitchingKey::new((ck1, sk1), (ck2, sk2), params); the
    server keys are only needed when the plaintext widths differ."""
    key = rng.fork(rng.key_from_seed(seed), 0xC5)
    ksk = generate_keyswitch_key(key, ck1.encryption_key, ck2.encryption_key,
                                 params.ks_decomp,
                                 ck2.encryption_noise_std, LOG_Q)
    src_total = ck1.params.message_modulus * ck1.params.carry_modulus
    dst_total = ck2.params.message_modulus * ck2.params.carry_modulus
    rshift = dst_total.bit_length() - src_total.bit_length()
    if rshift > 0 and dest_server_key is None:
        raise ValueError("casting into a wider set needs dest_server_key")
    if rshift < 0 and src_server_key is None:
        raise ValueError("casting into a narrower set needs src_server_key")
    return KeySwitchingKey(ksk=ksk, dest_params=ck2.params,
                           cast_rshift=rshift,
                           dest_server_key=dest_server_key,
                           src_server_key=src_server_key)
