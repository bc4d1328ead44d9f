"""Shortint ciphertext with degree/noise bookkeeping
(reference shortint/ciphertext/mod.rs)."""
from __future__ import annotations

from typing import Any

import flax.struct as struct

from ..core.entities import LweCiphertext


class CheckError(ValueError):
    """Operator precondition failure (reference `CheckError`,
    shortint/ciphertext/mod.rs): CarryFull (degree overflow) or NoiseTooBig
    (noise level above the parameter set's enforced maximum)."""


class NoiseLevel:
    """Mirrors reference `NoiseLevel` (shortint/ciphertext/mod.rs:64):
    NOMINAL after a PBS, ZERO for trivial, grows additively with linear ops."""

    ZERO = 0
    NOMINAL = 1
    UNKNOWN = 1 << 30


class MaxNoiseLevel:
    """Maximum tolerated noise level for a parameter set (reference
    `MaxNoiseLevel`, shortint/ciphertext/mod.rs:28-60).  Current parameter
    sets guarantee their p-fail for a norm2 noise bound equal to this value,
    derived from the carry space."""

    def __init__(self, value: int):
        self.value = int(value)

    @classmethod
    def from_msg_carry_modulus(cls, msg_modulus: int,
                               carry_modulus: int) -> "MaxNoiseLevel":
        return cls((carry_modulus * msg_modulus - 1) // (msg_modulus - 1))

    def validate(self, noise_level: int) -> None:
        if noise_level > self.value:
            raise CheckError(
                f"NoiseTooBig: noise level {noise_level} exceeds the "
                f"parameter set's maximum {self.value}")

    def __eq__(self, other):
        return isinstance(other, MaxNoiseLevel) and other.value == self.value

    def __repr__(self):
        return f"MaxNoiseLevel({self.value})"


@struct.dataclass
class Ciphertext:
    """LWE + static metadata.  `degree` bounds the *value* held (for carry
    overflow checks); `noise_level` counts accumulated linear operations."""

    lwe: LweCiphertext
    degree: int = struct.field(pytree_node=False, default=0)
    message_modulus: int = struct.field(pytree_node=False, default=4)
    carry_modulus: int = struct.field(pytree_node=False, default=4)
    noise_level: int = struct.field(pytree_node=False, default=NoiseLevel.NOMINAL)

    @property
    def batch_shape(self):
        return self.lwe.batch_shape

    @property
    def carry_is_empty(self) -> bool:
        return self.degree < self.message_modulus

    def with_(self, lwe=None, degree=None, noise_level=None) -> "Ciphertext":
        return Ciphertext(
            lwe=self.lwe if lwe is None else lwe,
            degree=self.degree if degree is None else degree,
            message_modulus=self.message_modulus,
            carry_modulus=self.carry_modulus,
            noise_level=self.noise_level if noise_level is None else noise_level,
        )


@struct.dataclass
class CompressedCiphertext:
    """Seeded shortint ciphertext: body + 32-bit mask seed + the same
    metadata as `Ciphertext` — (n+1)x smaller on the wire (reference
    shortint CompressedCiphertext, shortint/ciphertext/mod.rs:471-494).
    Built by ClientKey.encrypt_compressed; `decompress()` replays the
    mask stream."""

    ct: Any                        # SeededLweCiphertext
    degree: int = struct.field(pytree_node=False, default=0)
    message_modulus: int = struct.field(pytree_node=False, default=4)
    carry_modulus: int = struct.field(pytree_node=False, default=4)
    noise_level: int = struct.field(pytree_node=False, default=NoiseLevel.NOMINAL)

    def decompress(self) -> Ciphertext:
        from ..core.algorithms.seeded import decompress_lwe
        return Ciphertext(
            lwe=decompress_lwe(self.ct), degree=self.degree,
            message_modulus=self.message_modulus,
            carry_modulus=self.carry_modulus,
            noise_level=self.noise_level)
