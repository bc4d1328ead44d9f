"""Noise-measurement instrumentation for the gadget (p-encodings) module.

The fork adds two research probes that this module re-creates:

- ``measure_noise`` — a decrypt-based noise probe returning the signed
  distance of the phase from its nearest Z_p slot (reference
  ``GadgetEngine::measure_noise``, gadget/engine/mod.rs:194-232).  The
  reference computes it in f64 and scales by 2^64 (so the unit is
  torus-units x p); here it is exact integer arithmetic with the same
  scaling, so no rounding error pollutes the measurement.
- env-gated ciphertext dumps — the reference appends msgpack records to
  ``data_generation/noise_measurements/serializations/<name>.msgpack``
  when the ``PATTERN`` env var equals the pattern name (reference
  ``SerializableCiphertext::append_to_file``,
  gadget/ciphertext/mod.rs:283-301).  Here the record stream is a
  pickle-framed file (one ``pickle.dump`` per record, the Python analogue
  of streamed msgpack) under ``TFHE_TPU_DUMP_DIR`` (default
  ``data_generation/noise_measurements/serializations``).
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np

from ..core.algorithms import decrypt_lwe
from .engine import LOG_Q, Ciphertext, ClientKey

DUMP_DIR_ENV = "TFHE_TPU_DUMP_DIR"
PATTERN_ENV = "PATTERN"
_DEFAULT_DUMP_DIR = os.path.join("data_generation", "noise_measurements",
                                 "serializations")


def measure_noise(ck: ClientKey, ct: Ciphertext) -> np.ndarray:
    """Signed noise of every ciphertext in the batch, in torus-units x p
    (the reference's scale: ``round((closest - phase*p/2^64) * 2^64)``,
    gadget/engine/mod.rs:194-232 — computed exactly here).

    Returns int64 [...] matching the batch shape.  A fresh encryption at
    noise std sigma measures ~ sigma * p * 2^64 here.
    """
    phase = np.asarray(decrypt_lwe(ct.lwe, ck.encryption_key, LOG_Q))
    p = int(ct.encoding.modulus_p)
    q = 1 << LOG_Q
    flat = phase.reshape(-1)
    out = np.empty(flat.shape, dtype=np.int64)
    for i, ph in enumerate(flat):
        t = int(ph) * p          # phase * p, exact
        centered = ((t + (q >> 1)) % q) - (q >> 1)
        out[i] = -centered       # k*2^64 - phase*p for k = round(phase*p/2^64)
    return out.reshape(phase.shape)


@dataclass
class SerializableCiphertext:
    """Dump record (reference SerializableCiphertext,
    gadget/ciphertext/mod.rs:270-277): raw torus limbs + the expected
    message + the encoding modulus."""

    values: np.ndarray            # uint64 [..., n+1] raw LWE limbs
    expected_msg: int
    modulus: int                  # encoding's Z_p modulus (0 if unknown)
    log_ciphertext_modulus: int = LOG_Q

    @classmethod
    def from_ciphertext(cls, ct: Ciphertext,
                        expected_msg: int) -> "SerializableCiphertext":
        return cls(values=np.asarray(ct.lwe.data, dtype=np.uint64),
                   expected_msg=int(expected_msg),
                   modulus=int(ct.encoding.modulus_p))

    def append_to_file(self, pattern_name: str,
                       dump_dir: Optional[str] = None) -> bool:
        """Append this record iff env PATTERN == pattern_name (reference
        append_to_file).  Unlike the reference, an unset PATTERN is a no-op
        rather than a panic (instrumentation should never crash production
        paths).  Returns True when a record was written."""
        pattern = os.environ.get(PATTERN_ENV)
        if pattern is None or pattern != pattern_name:
            return False
        base = dump_dir or os.environ.get(DUMP_DIR_ENV, _DEFAULT_DUMP_DIR)
        os.makedirs(base, exist_ok=True)
        path = os.path.join(base, f"{pattern_name}.pkl")
        with open(path, "ab") as f:
            pickle.dump({"values": self.values,
                         "expected_msg": self.expected_msg,
                         "modulus": self.modulus,
                         "log_ciphertext_modulus": self.log_ciphertext_modulus},
                        f)
        return True


def iter_dumps(path: str) -> Iterator[dict]:
    """Read back a pickle-framed dump stream (one dict per record)."""
    with open(path, "rb") as f:
        while True:
            try:
                yield pickle.load(f)
            except EOFError:
                return


def load_dumps(path: str) -> List[dict]:
    return list(iter_dumps(path))
