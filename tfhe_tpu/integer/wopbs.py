"""Integer WoP-PBS: arbitrary LUTs over a whole radix integer.

Reference: tfhe/src/integer/wopbs/mod.rs (:216-487) — extract the message
bits of every block, circuit-bootstrap them into GGSWs, then evaluate one
vertical-packing LUT per output block (the GGSW list is shared across
output blocks, so additional outputs are nearly free).
"""
from __future__ import annotations

import math
from typing import Callable, List

import flax.struct as struct
import jax.numpy as jnp
import numpy as np

from ..core.algorithms.wopbs import vertical_packing
from ..core.entities import LweCiphertext
from ..shortint.ciphertext import Ciphertext as Block
from ..shortint.ciphertext import NoiseLevel
from ..shortint.client_key import LOG_Q, delta_for
from ..shortint.wopbs import WopbsKey
from .ciphertext import CrtCiphertext, RadixCiphertext


@struct.dataclass
class IntegerWopbsKey:
    wopbs_key: WopbsKey

    @property
    def params(self):
        return self.wopbs_key.params

    def _bits_per_block(self) -> int:
        return int(math.log2(self.params.message_modulus))

    def extract_radix_bits(self, ct: RadixCiphertext):
        """MSB-first GGSW list over all message bits of all blocks."""
        wk = self.wopbs_key
        bits_pb = self._bits_per_block()
        hats, shoups = [], []
        # most significant block first so the LUT index is the integer value
        for blk in reversed(ct.blocks):
            bits = wk.extract_bits_of(blk, bits_pb)
            h, s = wk.circuit_bootstrap(bits)
            hats.extend(h)
            shoups.extend(s)
        return hats, shoups

    def wopbs(self, ct: RadixCiphertext, f: Callable[[int], int]) -> RadixCiphertext:
        """Evaluate an arbitrary function over the radix value
        (reference WopbsKey::wopbs on RadixCiphertext)."""
        wk = self.wopbs_key
        bits_pb = self._bits_per_block()
        nb = ct.num_blocks
        total_bits = nb * bits_pb
        m = self.params.message_modulus
        n_poly = self.params.polynomial_size
        delta = delta_for(self.params)

        hats, shoups = self.extract_radix_bits(ct)

        out_blocks: List[Block] = []
        space = 1 << total_bits
        num_polys = max(1, space // n_poly)
        for out_blk in range(nb):
            vals = np.array(
                [((f(x) // (m ** out_blk)) % m) for x in range(space)],
                dtype=np.uint64) * delta
            polys = np.zeros((num_polys, n_poly), dtype=np.uint64)
            for x in range(space):
                polys[x // n_poly, x % n_poly] = vals[x]
            out = vertical_packing(jnp.asarray(polys), hats, shoups,
                                   wk.cbs_decomp,
                                   self.params.glwe_dimension, LOG_Q)
            out_blocks.append(Block(
                lwe=out, degree=m - 1,
                message_modulus=m, carry_modulus=self.params.carry_modulus,
                noise_level=NoiseLevel.NOMINAL))
        return RadixCiphertext(blocks=out_blocks)


    # ------------------------------------------------------------------
    # CRT ciphertexts (reference integer/wopbs/mod.rs:216-487 — the generic
    # wopbs<T: IntegerCiphertext> + generate_lut_crt :716-780)
    # ------------------------------------------------------------------

    def _crt_widths(self, ct: CrtCiphertext):
        """Bits per CRT block from its degree bound (reference
        generate_lut_crt: ceil(log2(degree + 1)) per block)."""
        return [max(1, int(math.ceil(math.log2(int(b.degree) + 1))))
                for b in ct.blocks]

    def extract_crt_bits(self, ct: CrtCiphertext):
        """MSB-first GGSW list over the residue bits of every CRT block
        (last block's MSB first — the same convention as the radix path, so
        block j occupies LUT-index bits [sum(widths[:j]), sum(widths[:j+1]))
        counting from the LSB)."""
        wk = self.wopbs_key
        widths = self._crt_widths(ct)
        hats, shoups = [], []
        for blk, b in zip(reversed(ct.blocks), reversed(widths)):
            bits = wk.extract_bits_of(blk, b)
            h, s = wk.circuit_bootstrap(bits)
            hats.extend(h)
            shoups.extend(s)
        return hats, shoups

    def wopbs_crt(self, ct: CrtCiphertext,
                  f: Callable[[int], int]) -> CrtCiphertext:
        """Arbitrary LUT over a CRT ciphertext: each output residue block j
        is f(x_j) mod m_j, with ALL blocks sharing ONE extracted-bit GGSW
        list (additional residues cost only their vertical-packing pass —
        reference WopbsKey::wopbs on CrtCiphertext + generate_lut_crt,
        integer/wopbs/mod.rs:716-780: the per-block LUT entry is
        f(v mod 2^deg mod m_j) mod m_j at the mixed-radix bit index)."""
        wk = self.wopbs_key
        widths = self._crt_widths(ct)
        total_bits = sum(widths)
        n_poly = self.params.polynomial_size
        delta = delta_for(self.params)

        hats, shoups = self.extract_crt_bits(ct)

        space = 1 << total_bits
        num_polys = max(1, space // n_poly)
        out_blocks: List[Block] = []
        offset = 0
        for blk, mj, bj in zip(ct.blocks, ct.moduli, widths):
            mask = (1 << bj) - 1
            idx = np.arange(space, dtype=np.uint64)
            vj = ((idx >> np.uint64(offset)) & np.uint64(mask)) % np.uint64(mj)
            vals = np.array([int(f(int(v))) % mj for v in vj],
                            dtype=np.uint64) * delta
            polys = np.zeros((num_polys, n_poly), dtype=np.uint64)
            polys.reshape(-1)[:space] = vals
            out = vertical_packing(jnp.asarray(polys), hats, shoups,
                                   wk.cbs_decomp,
                                   self.params.glwe_dimension, LOG_Q)
            out_blocks.append(Block(
                lwe=out, degree=mj - 1,
                message_modulus=blk.message_modulus,
                carry_modulus=blk.carry_modulus,
                noise_level=NoiseLevel.NOMINAL))
            offset += bj
        return CrtCiphertext(blocks=out_blocks, moduli=tuple(ct.moduli))


def new_integer_wopbs_key(wopbs_key: WopbsKey) -> IntegerWopbsKey:
    return IntegerWopbsKey(wopbs_key=wopbs_key)
