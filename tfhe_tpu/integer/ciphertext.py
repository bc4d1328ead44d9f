"""Radix / CRT ciphertexts (reference integer/ciphertext/mod.rs)."""
from __future__ import annotations

from typing import List, Sequence

import flax.struct as struct

from ..shortint.ciphertext import Ciphertext as ShortintCiphertext


@struct.dataclass
class RadixCiphertext:
    """Little-endian list of shortint blocks; value = Σ_i m_i * msg_mod^i
    (reference RadixCiphertext, integer/ciphertext/mod.rs:18)."""

    blocks: List[ShortintCiphertext]

    @property
    def num_blocks(self) -> int:
        return len(self.blocks)

    @property
    def message_modulus(self) -> int:
        return self.blocks[0].message_modulus

    @property
    def batch_shape(self):
        return self.blocks[0].batch_shape

    def block_carries_are_empty(self) -> bool:
        return all(b.carry_is_empty for b in self.blocks)


@struct.dataclass
class SignedRadixCiphertext(RadixCiphertext):
    """Two's-complement interpretation of the same block layout
    (reference SignedRadixCiphertext, integer/ciphertext/mod.rs:203)."""


@struct.dataclass
class BooleanBlock:
    """A single block holding 0/1 (reference BooleanBlock)."""

    block: ShortintCiphertext


@struct.dataclass
class CrtCiphertext:
    """Residues of the value modulo pairwise-coprime block moduli
    (reference CrtCiphertext, integer/ciphertext/mod.rs:431)."""

    blocks: List[ShortintCiphertext]
    moduli: Sequence[int] = struct.field(pytree_node=False, default=())
