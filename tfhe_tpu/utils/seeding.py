"""Secure seeding from OS entropy.

The reference pulls seeds from rdseed / /dev/random / SecureEnclave
(concrete-csprng/src/seeders/).  Portable equivalent: `os.urandom`, which
draws from the kernel CSPRNG on every platform we run on.  The native
AES-CTR stream generator (tfhe_tpu/native) can be layered on top when
AES-grade expansion is required.
"""
from __future__ import annotations

import os


def secure_seed(bits: int = 32) -> int:
    """A fresh seed from OS entropy (reference Seeder::seed)."""
    return int.from_bytes(os.urandom((bits + 7) // 8), "little") & ((1 << bits) - 1)
