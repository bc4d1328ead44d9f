"""Radix / CRT client keys: block (de)composition + per-block shortint
encryption (reference integer/client_key/, integer/encryption.rs)."""
from __future__ import annotations

import math
from typing import Sequence

import flax.struct as struct
import jax.numpy as jnp
import numpy as np

from .. import shortint
from ..core.params import shortint_params
from .ciphertext import CrtCiphertext, RadixCiphertext, SignedRadixCiphertext


@struct.dataclass
class RadixClientKey:
    key: shortint.ClientKey
    num_blocks: int = struct.field(pytree_node=False, default=4)

    @property
    def message_modulus(self) -> int:
        return self.key.params.message_modulus

    @property
    def bits_per_block(self) -> int:
        return int(math.log2(self.message_modulus))

    @property
    def total_bits(self) -> int:
        return self.num_blocks * self.bits_per_block

    def _block_values(self, values):
        """Host-side little-endian base-m block decomposition.  Python-int
        (object) arithmetic so >64-bit widths (FheUint128/256, reference
        U256/U512 bigints) encrypt exactly (integer/block_decomposition.rs)."""
        arr = np.asarray(values)
        shape = arr.shape
        # work on >=1-d object arrays: numpy ops on 0-d object arrays decay
        # to Python scalars (which have no .astype)
        arr = arr.reshape(-1).astype(object)
        m = int(self.message_modulus)
        space = m ** self.num_blocks
        arr = arr % space
        out = []
        for _ in range(self.num_blocks):
            out.append(jnp.asarray((arr % m).astype(np.uint64)).reshape(shape))
            arr = arr // m
        return out

    def encrypt(self, values, seed: int = 0) -> RadixCiphertext:
        """values: uint array [...] (any width — Python ints for >64 bits)
        → RadixCiphertext with [..., n+1] blocks."""
        blocks = [self.key.encrypt(bv, seed=seed * 1009 + i)
                  for i, bv in enumerate(self._block_values(values))]
        return RadixCiphertext(blocks=blocks)

    def encrypt_signed(self, values, seed: int = 0) -> SignedRadixCiphertext:
        ct = self.encrypt(values, seed)   # _block_values wraps mod m^nb
        return SignedRadixCiphertext(blocks=ct.blocks)

    def decrypt(self, ct: RadixCiphertext):
        """Python-int accumulation so >64-bit widths (FheUint128/256) work."""
        m = int(self.message_modulus)
        total = None
        weight = 1
        for b in ct.blocks:
            d = np.asarray(self.key.decrypt(b)).astype(object)
            total = d * weight if total is None else total + d * weight
            weight *= m
        mod = m ** ct.num_blocks
        total = np.asarray(total % mod, dtype=object)  # 0-d batches decay to int
        return total.astype(np.uint64) if mod <= (1 << 64) else total

    def decrypt_signed(self, ct: SignedRadixCiphertext):
        space = int(self.message_modulus) ** ct.num_blocks
        u = self.decrypt(ct).astype(object)
        signed = np.where(u >= space // 2, u - space, u)
        return signed.astype(np.int64) if space <= (1 << 64) else signed

    def trivial_encrypt(self, values) -> RadixCiphertext:
        blocks = [self.key.trivial_encrypt(bv)
                  for bv in self._block_values(values)]
        return RadixCiphertext(blocks=blocks)

    def decrypt_bool(self, ct) -> np.ndarray:
        """Decrypt a BooleanBlock to a bool array (reference
        ClientKey::decrypt_bool, integer/client_key/mod.rs)."""
        block = ct.block if hasattr(ct, "block") else ct
        return np.asarray(self.key.decrypt(block)).astype(bool)


@struct.dataclass
class CrtClientKey:
    key: shortint.ClientKey
    moduli: Sequence[int] = struct.field(pytree_node=False, default=(2, 3, 5))

    def encrypt(self, values, seed: int = 0) -> CrtCiphertext:
        vals = jnp.asarray(values).astype(jnp.uint64)
        # a fresh residue is < m_i: record the true degree (the reference's
        # fresh CRT blocks carry degree m_i - 1, which the CRT WoP-PBS uses
        # to size the per-block extracted-bit count)
        blocks = [self.key.unchecked_encrypt(
            vals % jnp.uint64(mi), seed=seed * 31 + i).with_(degree=mi - 1)
            for i, mi in enumerate(self.moduli)]
        return CrtCiphertext(blocks=blocks, moduli=tuple(self.moduli))

    def decrypt(self, ct: CrtCiphertext):
        """CRT reconstruction of the residues."""
        M = 1
        for mi in ct.moduli:
            M *= mi
        total = None
        for b, mi in zip(ct.blocks, ct.moduli):
            d = np.asarray(self.key.decrypt_message_and_carry(b)).astype(np.int64) % mi
            Mi = M // mi
            yi = pow(Mi, -1, mi)
            term = d * (Mi * yi)
            total = term if total is None else total + term
        return (total % M).astype(np.uint64)
