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


# ---------------------------------------------------------------------------
# combined regime: dedicated WoP-PBS parameter set + casting KSKs
# (reference WopbsKey::new_wopbs_key, shortint/engine/wopbs/mod.rs:50-140)
# ---------------------------------------------------------------------------


def _wopbs_client_key(ck: ClientKey, wparams, seed: int) -> ClientKey:
    """The independent client key dedicated to the WoP-PBS regime
    (reference engine/wopbs/mod.rs:56-68).  Deterministic in (seed), so
    tests can re-derive it for decryption checks."""
    from ..core.algorithms import (generate_glwe_secret_key,
                                   generate_lwe_secret_key)
    root = rng.fork(rng.key_from_seed(seed), 0xA0B5)
    k_glwe, k_lwe = rng.split(root)
    glwe_sk = generate_glwe_secret_key(k_glwe, wparams.glwe_dimension,
                                       wparams.polynomial_size)
    lwe_sk = generate_lwe_secret_key(k_lwe, wparams.lwe_dimension)
    return ClientKey(glwe_sk=glwe_sk, lwe_sk=lwe_sk, params=wparams)


@struct.dataclass
class CombinedWopbsKey:
    """reference shortint WopbsKey in the combined regime
    (wopbs/mod.rs:46-49): a dedicated wopbs parameter set with casting
    keyswitch keys into and out of the compute (PBS) regime.

      wopbs_key        — only-for-wopbs key at the wopbs parameters
                         (wopbs server key + cbs pfpksk)
      pbs_server_key   — the compute ServerKey with its KSK replaced by
                         ksk_wopbs_large_to_pbs_small, so one
                         apply_lookup_table = the reference's
                         keyswitch_to_pbs_params KS+PBS pair
      ksk_pbs_to_wopbs — compute-big → wopbs-big LWE keyswitch key
                         (reference ksk_pbs_large_to_wopbs_large)
    """

    wopbs_key: WopbsKey
    pbs_server_key: ServerKey
    ksk_pbs_to_wopbs: "Any"

    @property
    def params(self):
        return self.wopbs_key.params

    def keyswitch_to_wopbs_params(self, sks: ServerKey, ct: Ciphertext) -> Ciphertext:
        """Clean PBS (compute key) then cast into the wopbs regime
        (reference keyswitch_to_wopbs_params, wopbs/mod.rs:724)."""
        from ..core.algorithms import keyswitch_lwe
        clean = sks.apply_lookup_table(ct, sks.generate_lookup_table(lambda x: x))
        ks = keyswitch_lwe(clean.lwe, self.ksk_pbs_to_wopbs, LOG_Q)
        return ct.with_(lwe=ks, degree=ct.degree, noise_level=NoiseLevel.NOMINAL)

    def keyswitch_to_pbs_params(self, ct: Ciphertext) -> Ciphertext:
        """KS back to the compute small key + clean PBS
        (reference keyswitch_to_pbs_params, wopbs/mod.rs:660)."""
        lut = self.pbs_server_key.generate_lookup_table(lambda x: x)
        out = self.pbs_server_key.apply_lookup_table(ct, lut)
        return out.with_(degree=ct.degree)

    def generate_lut(self, f) -> WopbsLut:
        return self.wopbs_key.generate_lut(f)

    def wopbs(self, sks: ServerKey, ct: Ciphertext, lut: WopbsLut) -> Ciphertext:
        """Arbitrary-function bootstrap through the wopbs regime
        (reference WopbsKey::wopbs, wopbs/mod.rs:404)."""
        ct_w = self.keyswitch_to_wopbs_params(sks, ct)
        res = self.wopbs_key.wopbs(ct_w, lut)
        return self.keyswitch_to_pbs_params(res)


def new_wopbs_key(ck: ClientKey, sk: ServerKey, wparams="auto",
                  seed: int = 0) -> CombinedWopbsKey:
    """reference WopbsKey::new_wopbs_key (combined regime,
    engine/wopbs/mod.rs:50): independent wopbs-regime keys + the three
    casting keyswitch keys.

    wparams: a WopbsParameters, a named-set string, or "auto" to pick
    WOPBS_PARAM_MESSAGE_{m}_CARRY_{c}_KS_PBS matching the compute set."""
    from ..core.algorithms import generate_keyswitch_key
    from ..core.params import wopbs_params as lookup_wopbs
    from .server_key import gen_server_key

    p = ck.params
    if wparams == "auto":
        import math as _m
        mb = int(_m.log2(p.message_modulus))
        cb = int(_m.log2(p.carry_modulus))
        wparams = lookup_wopbs(
            f"WOPBS_PARAM_MESSAGE_{mb}_CARRY_{cb}_KS_PBS")
    elif isinstance(wparams, str):
        wparams = lookup_wopbs(wparams)

    wck = _wopbs_client_key(ck, wparams, seed)
    root = rng.fork(rng.key_from_seed(seed), 0xC0B5)
    k_srv, k_pf, k_in, k_out = rng.split(root, 4)
    wsk = gen_server_key(wck, k_srv)
    pfpksk = generate_cbs_pfpksk(k_pf, wck.big_sk, wck.glwe_sk,
                                 wparams.pfks_decomp, wparams.pfks_noise_std,
                                 LOG_Q)
    inner = WopbsKey(server_key=wsk, pfpksk=pfpksk,
                     cbs_decomp=wparams.cbs_decomp)
    # compute-big -> wopbs-big (compute ks decomp, wopbs lwe noise —
    # reference engine/wopbs/mod.rs:106-115)
    ksk_in = generate_keyswitch_key(k_in, ck.big_sk, wck.big_sk,
                                    p.ks_decomp, wparams.lwe_noise_std, LOG_Q)
    # wopbs-big -> compute-small (compute ks decomp + noise, :118-127)
    ksk_out = generate_keyswitch_key(k_out, wck.big_sk, ck.lwe_sk,
                                     p.ks_decomp, p.lwe_noise_std, LOG_Q)
    pbs_sk = ServerKey(ksk=ksk_out, bsk=sk.bsk, params=p)
    return CombinedWopbsKey(wopbs_key=inner, pbs_server_key=pbs_sk,
                            ksk_pbs_to_wopbs=ksk_in)
