"""integer — radix & CRT big integers over shortint blocks.

Re-design of the reference integer layer (tfhe/src/integer/, 38 kLoC):
a `RadixCiphertext` is a little-endian list of shortint blocks
(integer/ciphertext/mod.rs:18); server ops decompose into blockwise shortint
LUT evaluations.  TPU-native twist: independent blockwise PBS calls are
*stacked into the batch axis* so one radix op issues a few large batched
bootstraps instead of many small ones (the rayon fan-outs of
integer/server_key/radix_parallel/ become array axes).
"""
from .ciphertext import CrtCiphertext, RadixCiphertext, SignedRadixCiphertext
from .client_key import CrtClientKey, RadixClientKey
from .server_key import ServerKey, gen_keys

__all__ = ["RadixCiphertext", "SignedRadixCiphertext", "CrtCiphertext",
           "RadixClientKey", "CrtClientKey", "ServerKey", "gen_keys"]
