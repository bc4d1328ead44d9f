"""Ciphertext / key entities as batched JAX arrays.

TPU-native re-design of the reference's 37 container-generic entity types
(tfhe/src/core_crypto/entities/): instead of flat-slice containers with
owned/view/mut variants, each entity is a frozen pytree (flax.struct) holding
one dense array whose *leading* axes are free batch axes.  Layouts:

  LweCiphertext.data      [..., n+1]            mask a_0..a_{n-1}, body b last
  GlweCiphertext.data     [..., k+1, N]         k mask polys then body poly
  GgswCiphertext.data     [..., l, k+1, k+1, N] level-major rows, each a GLWE
  LweKeyswitchKey.data    [n_in, l, n_out+1]
  LwePackingKeyswitchKey.data [n_in, l, k+1, N]
  LweBootstrapKey.data    [n, l, k+1, k+1, N]   GGSW per input key bit
  NttLweBootstrapKey      BSK pre-transformed to the NTT domain (the Fourier
                          BSK analogue, reference fft64/crypto/bootstrap.rs:27)

dtype is uint64 (or uint32 for the boolean scheme's 32-bit torus); wrapping
unsigned arithmetic is torus addition.
"""
from __future__ import annotations

from typing import Any

import flax.struct as struct
import jax.numpy as jnp

from .params import DecompParams


def _static(**kw):
    return struct.field(pytree_node=False, **kw)


@struct.dataclass
class LweCiphertext:
    """(a, b) with b = <a, s> + m + e.  data[..., n+1], body last.
    Reference: entities/lwe_ciphertext.rs:501."""

    data: Any

    @property
    def lwe_dimension(self) -> int:
        return self.data.shape[-1] - 1

    @property
    def mask(self):
        return self.data[..., :-1]

    @property
    def body(self):
        return self.data[..., -1]

    @property
    def batch_shape(self):
        return self.data.shape[:-1]


@struct.dataclass
class LweSecretKey:
    """Binary key bits as int8[n].  Reference: entities/lwe_secret_key.rs."""

    bits: Any

    @property
    def lwe_dimension(self) -> int:
        return self.bits.shape[-1]


@struct.dataclass
class GlweCiphertext:
    """data[..., k+1, N]: k uniform mask polynomials then the body polynomial.
    Reference: entities/glwe_ciphertext.rs."""

    data: Any

    @property
    def glwe_dimension(self) -> int:
        return self.data.shape[-2] - 1

    @property
    def polynomial_size(self) -> int:
        return self.data.shape[-1]

    @property
    def mask(self):
        return self.data[..., :-1, :]

    @property
    def body(self):
        return self.data[..., -1, :]


@struct.dataclass
class GlweSecretKey:
    """k binary polynomials, int8[k, N].  The flattened view (row-major,
    poly-coefficient minor) is the 'big' LWE key of dim k*N, matching the
    reference's `into_lwe_secret_key` semantics."""

    bits: Any

    @property
    def glwe_dimension(self) -> int:
        return self.bits.shape[-2]

    @property
    def polynomial_size(self) -> int:
        return self.bits.shape[-1]

    def as_lwe_secret_key(self) -> LweSecretKey:
        return LweSecretKey(bits=self.bits.reshape(*self.bits.shape[:-2], -1))


@struct.dataclass
class GgswCiphertext:
    """data[..., l, k+1, k+1, N]: level-major; row r of level j encrypts
    -m * s_r * q/B^{j+1} (last row: +m * q/B^{j+1}).
    Reference: entities/ggsw_ciphertext.rs."""

    data: Any
    decomp: DecompParams = _static(default=None)

    @property
    def level_count(self) -> int:
        return self.data.shape[-4]

    @property
    def glwe_size(self) -> int:
        return self.data.shape[-3]

    @property
    def polynomial_size(self) -> int:
        return self.data.shape[-1]


@struct.dataclass
class GswCiphertext:
    """data[..., l, n+1, n+1]: level-major; row r of level j is an LWE
    encrypting -m * s_r * q/B^(j+1) (last row: +m * q/B^(j+1)) — the
    PolynomialSize=1 specialization of GGSW.
    Reference: entities/gsw_ciphertext.rs (container only there; encrypt and
    the external product live in algorithms/gsw.py here)."""

    data: Any
    decomp: DecompParams = _static(default=None)

    @property
    def level_count(self) -> int:
        return self.data.shape[-3]

    @property
    def lwe_size(self) -> int:
        return self.data.shape[-2]


@struct.dataclass
class LweBootstrapKey:
    """data[n, l, k+1, k+1, N] — one GGSW (of the GLWE key) per bit of the
    input LWE key.  Reference: entities/lwe_bootstrap_key.rs."""

    data: Any
    decomp: DecompParams = _static(default=None)

    @property
    def input_lwe_dimension(self) -> int:
        return self.data.shape[0]

    @property
    def glwe_size(self) -> int:
        return self.data.shape[-3]

    @property
    def polynomial_size(self) -> int:
        return self.data.shape[-1]

    @property
    def output_lwe_dimension(self) -> int:
        return (self.glwe_size - 1) * self.polynomial_size


@struct.dataclass
class NttLweBootstrapKey:
    """BSK with every polynomial pre-transformed into the CRT-NTT domain —
    the analogue of the reference's `FourierLweBootstrapKey`
    (fft_impl/fft64/crypto/bootstrap.rs:27), computed once at keygen.

    data[n, P, l*(k+1), k+1, N] uint64 (values < p): P CRT primes,
    contraction axis l*(k+1) flattened to feed the external-product MAC
    directly.  `shoup` holds the per-entry precomputed quotients
    floor(val*2^32/p) for division-free modular multiplication in the MAC
    (poly/ntt.py; uint64 because uint32 lowering is slow on this backend).
    """

    data: Any
    shoup: Any = None
    # u32 spectra for the fused Pallas rotation + shoup twin.
    # 'dif' order (VPU butterfly kernel): [n, 2, P, J, R, N] — the paired
    # (GGSW(1-s), GGSW(s)) phase-domain form.
    # 'fourstep' order (MXU kernel): [n, P, J, R, N] — plain GGSW(s) spectra;
    # the step runs as a delta-CMUX with table-gathered (X^a - 1) phases.
    paired: Any = None
    paired_shoup: Any = None
    # full-exponent (X^a - 1) phase tables [2N, P, N1, N2] u32 + shoup for
    # the MXU delta-CMUX kernel (fourstep.monomial_full_tables).  Derivable
    # from (N, P): serialization stores a marker and regenerates on load.
    # Carried on the key so they ride jit boundaries as runtime buffers
    # instead of being baked into HLO as 128 MB constants.
    mono: Any = None
    mono_shoup: Any = None
    decomp: DecompParams = _static(default=None)
    log_q: int = _static(default=64)
    # spectral ordering of `paired` — execution follows this field
    paired_order: str = _static(default="dif")

    def slim(self) -> "NttLweBootstrapKey":
        """Drop the u64 XLA-path spectra, keeping only the u32 paired form
        the fused kernel consumes — halves device HBM for the key (the 4_4
        regime's full key would not fit the 16 GB chip otherwise).  The
        XLA fallback path is unavailable on a slimmed key."""
        return self.replace(data=None, shoup=None)

    def slim_pretiled(self) -> "NttLweBootstrapKey":
        """slim() + host-side [..., N] -> [..., N1, N2] retile of the paired
        spectra: the in-jit retiling reshape physically copies the key in
        HBM (2 x 3.9 GB at 4_4 — OOM observed), so large-N transfers ship
        the tiled form.  Use for any N >= 16384 device run (bench.py,
        tools/pfail_sample.py)."""
        from .poly.fourstep import _split_nm
        b = self.slim()
        if b._paired_tiled:
            return b
        n = self.polynomial_size
        n1, n2 = _split_nm(n)
        tile = lambda a: a.reshape(a.shape[:-1] + (n1, n2))
        return b.replace(paired=tile(b.paired),
                         paired_shoup=tile(b.paired_shoup))

    @property
    def _paired_tiled(self) -> bool:
        """Whether `paired` is stored pre-retiled as [..., N1, N2] (the
        large-N slim form — avoids the in-jit retiling copy of the key)."""
        flat = 5 if self.paired_order.startswith("fourstep") else 6
        return self.paired is not None and self.paired.ndim == flat + 1

    @property
    def input_lwe_dimension(self) -> int:
        return (self.data if self.data is not None else self.paired).shape[0]

    @property
    def glwe_size(self) -> int:
        if self.data is not None:
            return self.data.shape[-2]
        return self.paired.shape[-3 if self._paired_tiled else -2]

    @property
    def polynomial_size(self) -> int:
        if self.data is not None:
            return self.data.shape[-1]
        p = self.paired
        return (p.shape[-2] * p.shape[-1] if self._paired_tiled
                else p.shape[-1])


@struct.dataclass
class LweKeyswitchKey:
    """data[n_in, l, n_out+1]: level-major LWE encryptions of s_i * q/B^{j+1}.
    Reference: entities/lwe_keyswitch_key.rs."""

    data: Any
    decomp: DecompParams = _static(default=None)

    @property
    def input_lwe_dimension(self) -> int:
        return self.data.shape[0]

    @property
    def output_lwe_dimension(self) -> int:
        return self.data.shape[-1] - 1


@struct.dataclass
class LwePackingKeyswitchKey:
    """data[n_in, l, k+1, N]: GLWE encryptions of s_i * q/B^{j+1}.
    Reference: entities/lwe_packing_keyswitch_key.rs."""

    data: Any
    decomp: DecompParams = _static(default=None)

    @property
    def input_lwe_dimension(self) -> int:
        return self.data.shape[0]

    @property
    def glwe_size(self) -> int:
        return self.data.shape[-2]

    @property
    def polynomial_size(self) -> int:
        return self.data.shape[-1]


@struct.dataclass
class GlweRelinearizationKey:
    """Fork entity (entities/custom_glwe_relinearization_key.rs): for each
    unordered pair (i <= j) of GLWE key polys, l GLWE encryptions of
    s_i*s_j * q/B^(lvl+1).  data[num_pairs, l, k+1, N], pairs in row-major
    (i, j >= i) order."""

    data: Any
    decomp: DecompParams = _static(default=None)

    @property
    def glwe_size(self) -> int:
        return self.data.shape[-2]

    @property
    def polynomial_size(self) -> int:
        return self.data.shape[-1]


@struct.dataclass
class Plaintext:
    data: Any


def lwe_size(lwe_dimension: int) -> int:
    return lwe_dimension + 1
