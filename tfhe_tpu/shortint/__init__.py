"""shortint — message+carry encoded words with LUT bootstrapping.

Re-design of the reference's workhorse scheme (tfhe/src/shortint/, 25 kLoC):
a shortint ciphertext is an LWE encryption of `m * Δ` with
Δ = q / (2 * message_modulus * carry_modulus) (one padding bit); operations
track `degree` (max attainable value) and `noise_level` as *static* host-side
metadata (they are data-independent, so they live on the pytree's aux side —
the jit-friendly equivalent of shortint/ciphertext/mod.rs:263 bookkeeping).

Batching: `Ciphertext.lwe.data` is [..., n+1]; every server-key op maps over
the batch in one XLA program.
"""
from .ciphertext import (CheckError, Ciphertext, CompressedCiphertext,
                         MaxNoiseLevel, NoiseLevel)
from .client_key import ClientKey, gen_keys
from .key_switching_key import KeySwitchingKey, generate_key_switching_key
from .server_key import (CompressedServerKey, LookupTable, MaxDegree,
                         ServerKey, gen_compressed_server_key)

__all__ = ["CheckError", "Ciphertext", "CompressedCiphertext",
           "ClientKey", "ServerKey",
           "KeySwitchingKey", "LookupTable", "MaxDegree", "MaxNoiseLevel",
           "NoiseLevel", "gen_keys", "generate_key_switching_key",
           "CompressedServerKey", "gen_compressed_server_key"]
