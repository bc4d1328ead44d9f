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
from .ciphertext import RadixCiphertext


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


def new_integer_wopbs_key(wopbs_key: WopbsKey) -> IntegerWopbsKey:
    return IntegerWopbsKey(wopbs_key=wopbs_key)
