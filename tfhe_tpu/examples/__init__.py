"""Worked examples mirroring the reference's tfhe/examples/:
sha256_bool (boolean-gate SHA-256), dark_market (encrypted order matching),
regex_engine (encrypted regex matching)."""
