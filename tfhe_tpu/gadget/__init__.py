"""gadget — odd-plaintext-modulus "p-encodings" Boolean engine (BPR24).

Re-design of the fork's research module (reference tfhe/src/gadget/,
~3.8 kLoC): Boolean/small-arithmetic functions evaluated with a *single* PBS
by encoding Z_o values into Z_p subsets for odd p.  Includes the whole fork
surface: odd-p accumulators, gadget execution, LUTs, encoding switching,
multi-value bootstrap (MVB), tree bootstrap, GLWE-mult-based LWE
multiplication and the WoP-PBS-via-multiplication path.
"""
from .encoding import Encoding
from .engine import (Ciphertext, ClientKey, Gadget, ServerKey, decrypt,
                     encrypt_arithmetic, gen_keys)
from .instrument import SerializableCiphertext, load_dumps, measure_noise

__all__ = ["Encoding", "Ciphertext", "ClientKey", "ServerKey", "Gadget",
           "gen_keys", "encrypt_arithmetic", "decrypt",
           "measure_noise", "SerializableCiphertext", "load_dumps"]
