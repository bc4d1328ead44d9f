"""Shortint WoP-PBS: LUT evaluation over the full message+carry space via
bit extraction + circuit bootstrap + vertical packing.

Reference: tfhe/src/shortint/wopbs/mod.rs (WopbsKey :44, keygen :398-660,
wopbs/generate_lut flows).  This implements the
`new_wopbs_key_only_for_wopbs` regime (one parameter set for both the PBS
and the WoP-PBS pipelines), the common production configuration.
"""
from __future__ import annotations

import math
from typing import Callable, List

import flax.struct as struct
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..core.algorithms.wopbs import (CbsPfpkskList, circuit_bootstrap_boolean,
                                     extract_bits, generate_cbs_pfpksk,
                                     ggsw_to_ntt, vertical_packing)
from ..core.entities import LweCiphertext
from ..core.params import DecompParams
from .ciphertext import Ciphertext, NoiseLevel
from .client_key import LOG_Q, ClientKey, delta_for
from .server_key import ServerKey


@struct.dataclass
class WopbsLut:
    """Clear LUT polynomials [2^t, N] for vertical packing."""

    polys: jnp.ndarray
    degree: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class WopbsKey:
    """reference shortint WopbsKey (wopbs/mod.rs:44), only-for-wopbs regime."""

    server_key: ServerKey
    pfpksk: CbsPfpkskList
    cbs_decomp: DecompParams = struct.field(pytree_node=False, default=None)

    @property
    def params(self):
        return self.server_key.params

    @property
    def message_bits(self) -> int:
        p = self.params.message_modulus * self.params.carry_modulus
        return int(math.log2(p))

    @property
    def delta_log(self) -> int:
        return LOG_Q - 1 - self.message_bits

    # ------------------------------------------------------------------

    def generate_lut(self, f: Callable[[int], int]) -> WopbsLut:
        """LUT over the full message+carry space (reference generate_lut_*)."""
        p = 1 << self.message_bits
        n_poly = self.params.polynomial_size
        delta = delta_for(self.params)
        vals = np.array([f(i) % (2 * p) for i in range(p)], dtype=np.uint64) * delta
        num_polys = max(1, p // n_poly)
        polys = np.zeros((num_polys, n_poly), dtype=np.uint64)
        for v in range(p):
            polys[v // n_poly, v % n_poly] = vals[v]
        return WopbsLut(polys=jnp.asarray(polys),
                        degree=int(max(f(i) % p for i in range(p))))

    def extract_bits(self, ct: Ciphertext) -> LweCiphertext:
        return extract_bits(ct.lwe, self.server_key.ksk, self.server_key.bsk,
                            self.delta_log, self.message_bits, LOG_Q)

    def extract_bits_of(self, ct: Ciphertext, num_bits: int) -> LweCiphertext:
        """Extract only the `num_bits` low bits of the block value (the
        message bits, used by the integer-level WoP-PBS)."""
        return extract_bits(ct.lwe, self.server_key.ksk, self.server_key.bsk,
                            self.delta_log, num_bits, LOG_Q)

    def circuit_bootstrap(self, bits: LweCiphertext):
        """Per extracted bit: one GGSW (MSB first), NTT-transformed."""
        hats, shoups = [], []
        for i in range(bits.data.shape[-2]):
            bit_lwe = LweCiphertext(data=bits.data[..., i, :])
            ggsw = circuit_bootstrap_boolean(
                self.server_key.bsk, bit_lwe, self.pfpksk, self.cbs_decomp,
                LOG_Q - 1, LOG_Q)
            h, s = ggsw_to_ntt(ggsw, LOG_Q)
            hats.append(h)
            shoups.append(s)
        return hats, shoups

    def wopbs(self, ct: Ciphertext, lut: WopbsLut) -> Ciphertext:
        """Arbitrary-function bootstrap over message+carry
        (reference WopbsKey::wopbs)."""
        bits = self.extract_bits(ct)
        hats, shoups = self.circuit_bootstrap(bits)
        out = vertical_packing(lut.polys, hats, shoups, self.cbs_decomp,
                               self.params.glwe_dimension, LOG_Q)
        return ct.with_(lwe=out, degree=lut.degree,
                        noise_level=NoiseLevel.NOMINAL)


def new_wopbs_key_only_for_wopbs(ck: ClientKey, sk: ServerKey,
                                 cbs_decomp: DecompParams = None,
                                 pfks_decomp: DecompParams = None,
                                 seed: int = 0) -> WopbsKey:
    """reference WopbsKey::new_wopbs_key_only_for_wopbs (shortint/wopbs)."""
    p = ck.params
    cbs_decomp = cbs_decomp or DecompParams(6, 2)
    pfks_decomp = pfks_decomp or DecompParams(4, 8)
    key = rng.fork(rng.key_from_seed(seed), 0xCB5)
    pfpksk = generate_cbs_pfpksk(key, ck.big_sk, ck.glwe_sk, pfks_decomp,
                                 p.glwe_noise_std, LOG_Q)
    return WopbsKey(server_key=sk, pfpksk=pfpksk, cbs_decomp=cbs_decomp)
