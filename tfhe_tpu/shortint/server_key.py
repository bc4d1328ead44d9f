"""Shortint server key: lookup-table bootstrapping and the arithmetic op
families (reference shortint/server_key/, esp. mod.rs:284-920 and the
per-op files add.rs, mul.rs, div_mod.rs, bitwise_op.rs, comp_op.rs,
shift.rs, scalar_*.rs).

Op families (reference semantics):
  unchecked_*  — no precondition checks, degrees add up;
  checked_*    — raise if the result would overflow the carry space;
  smart_*      — bootstrap operands first when needed (decision is static
                 metadata, so it specializes the jitted program);
  *_           — "default" ops: smart + final carry cleanup on the result
                 message (what the HLAPI uses).
"""
from __future__ import annotations

from typing import Any, Callable

import flax.struct as struct
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..core.algorithms import (bootstrap_key_to_ntt, external_product_num_primes,
                               generate_bootstrap_key, generate_keyswitch_key,
                               keyswitch_lwe, programmable_bootstrap,
                               sample_extract, trivial_glwe)
from ..core.entities import (GlweCiphertext, LweCiphertext, LweKeyswitchKey,
                             NttLweBootstrapKey)
from ..core.params import PBSOrder
from .ciphertext import Ciphertext, NoiseLevel
from .client_key import LOG_Q, ClientKey, delta_for


class MaxDegree:
    """Reference `MaxDegree` (shortint/server_key/mod.rs): the largest value
    representable without touching the padding bit."""

    @staticmethod
    def integer_radix(message_modulus: int, carry_modulus: int) -> int:
        return message_modulus * carry_modulus - 1


@struct.dataclass
class LookupTable:
    """An accumulator GLWE + the output degree bound
    (reference `LookupTableOwned`, shortint/server_key/mod.rs:383)."""

    acc: GlweCiphertext
    degree: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class ServerKey:
    ksk: LweKeyswitchKey
    bsk: NttLweBootstrapKey
    params: Any = struct.field(pytree_node=False)

    @property
    def message_modulus(self) -> int:
        return self.params.message_modulus

    @property
    def carry_modulus(self) -> int:
        return self.params.carry_modulus

    @property
    def max_degree(self) -> int:
        return MaxDegree.integer_radix(self.message_modulus, self.carry_modulus)

    # ------------------------------------------------------------------
    # LUT machinery
    # ------------------------------------------------------------------

    def generate_lookup_table(self, f: Callable[[int], int]) -> LookupTable:
        """Accumulator for x ↦ f(x) over the message+carry space
        (reference generate_lookup_table, shortint/server_key/mod.rs:383).

        Coefficient layout: box = N/p per input value, rotated by half a box
        so the rounding window centers on each message; negacyclic wrap
        negates the tail."""
        p = self.message_modulus * self.carry_modulus
        n_poly = self.params.polynomial_size
        box = n_poly // p
        delta = delta_for(self.params)
        vals = np.array([f(i) % (2 * p) for i in range(p)], dtype=np.uint64)
        poly = np.repeat(vals * delta, box)
        poly = np.roll(poly, -(box // 2))
        poly[-(box // 2):] = np.uint64(0) - poly[-(box // 2):]
        acc = trivial_glwe(jnp.asarray(poly), self.params.glwe_dimension, LOG_Q)
        return LookupTable(acc=acc, degree=int(vals.max()))

    def generate_msg_lookup_table(self, f: Callable[[int], int]) -> LookupTable:
        """LUT of f modulo message_modulus (reference generate_msg_lookup_table)."""
        m = self.message_modulus
        return self.generate_lookup_table(lambda x: f(x) % m)

    def _pbs(self, lwe, acc):
        """Dispatch classic vs multi-bit bootstrap (the reference's
        ShortintBootstrappingKey::Classic | MultiBit, shortint/server_key/mod.rs:104)."""
        from .. import config
        from ..core.algorithms.multi_bit import (NttMultiBitBootstrapKey,
                                                 multi_bit_blind_rotate)
        from ..core.entities import GlweCiphertext
        if isinstance(self.bsk, NttMultiBitBootstrapKey):
            if config.use_pallas_pbs() and self.bsk.data_u32 is not None:
                import os
                from ..core.poly.pallas_ntt import (
                    blind_rotate_fused, multi_bit_blind_rotate_pallas)
                block_b = int(os.environ.get("TFHE_TPU_PALLAS_BLOCK", "8"))
                if (config.use_fused_rotation()
                        and self.bsk.u32_order == "fourstep"):
                    rotated = GlweCiphertext(data=blind_rotate_fused(
                        acc.data, lwe.data, self.bsk.data_u32,
                        self.bsk.shoup_u32, self.bsk.mono,
                        self.bsk.mono_shoup, self.bsk.decomp, log_q=LOG_Q,
                        block_b=block_b, mode="multibit",
                        grouping=self.bsk.grouping_factor))
                    return sample_extract(rotated, 0)
                rotated = GlweCiphertext(data=multi_bit_blind_rotate_pallas(
                    acc.data, lwe.data, self.bsk.data_u32, self.bsk.shoup_u32,
                    self.bsk.decomp, self.bsk.grouping_factor, log_q=LOG_Q,
                    block_b=block_b,
                    mxu=self.bsk.u32_order.startswith("fourstep"),
                    lanes=(self.bsk.u32_order == "fourstep-lanes"),
                    mono_tab=self.bsk.mono, mono_sh=self.bsk.mono_shoup))
                return sample_extract(rotated, 0)
            rotated = multi_bit_blind_rotate(acc, lwe, self.bsk, LOG_Q)
            return sample_extract(rotated, 0)
        return programmable_bootstrap(lwe, acc, self.bsk, LOG_Q)

    def apply_lookup_table(self, ct: Ciphertext, lut: LookupTable) -> Ciphertext:
        """KS → PBS (default KeyswitchBootstrap order) — the atomic pattern
        (reference apply_lookup_table_assign, shortint/server_key/mod.rs:465)."""
        if self.params.pbs_order == PBSOrder.KEYSWITCH_BOOTSTRAP:
            small = keyswitch_lwe(ct.lwe, self.ksk, LOG_Q)
            out = self._pbs(small, lut.acc)
        else:
            big = self._pbs(ct.lwe, lut.acc)
            out = keyswitch_lwe(big, self.ksk, LOG_Q)
        return ct.with_(lwe=out, degree=lut.degree, noise_level=NoiseLevel.NOMINAL)

    def evaluate_univariate(self, ct: Ciphertext, f: Callable[[int], int]) -> Ciphertext:
        return self.apply_lookup_table(ct, self.generate_lookup_table(f))

    def generate_bivariate_lookup_table(self, f: Callable[[int, int], int]) -> LookupTable:
        """LUT over packed (left * msg_mod + right)
        (reference generate_lookup_table_bivariate)."""
        m = self.message_modulus
        return self.generate_lookup_table(lambda x: f(x // m, x % m))

    def unchecked_apply_lookup_table_bivariate(self, left: Ciphertext,
                                               right: Ciphertext,
                                               lut: LookupTable) -> Ciphertext:
        packed = self.unchecked_bivariate_pack(left, right)
        return self.apply_lookup_table(packed, lut)

    def unchecked_bivariate_pack(self, left: Ciphertext, right: Ciphertext) -> Ciphertext:
        """left * msg_mod + right — requires right.degree < msg_mod and
        left.degree * msg_mod + right.degree ≤ max_degree."""
        m = self.message_modulus
        data = left.lwe.data * jnp.uint64(m) + right.lwe.data
        return left.with_(lwe=LweCiphertext(data=data),
                          degree=left.degree * m + right.degree,
                          noise_level=left.noise_level * m + right.noise_level)

    def smart_evaluate_bivariate(self, left: Ciphertext, right: Ciphertext,
                                 f: Callable[[int, int], int]) -> Ciphertext:
        left, right = self._prepare_bivariate(left, right)
        lut = self.generate_bivariate_lookup_table(f)
        return self.unchecked_apply_lookup_table_bivariate(left, right, lut)

    def _prepare_bivariate(self, left, right):
        m = self.message_modulus
        if right.degree >= m:
            right = self.message_extract(right)
        if left.degree * m + right.degree > self.max_degree:
            left = self.message_extract(left)
        return left, right

    # ------------------------------------------------------------------
    # carry / message extraction
    # ------------------------------------------------------------------

    def carry_extract(self, ct: Ciphertext) -> Ciphertext:
        """x ↦ x // msg_mod (reference carry_extract, server_key/mod.rs:539)."""
        m = self.message_modulus
        out = self.evaluate_univariate(ct, lambda x: x // m)
        return out.with_(degree=min(out.degree, ct.degree // m))

    def message_extract(self, ct: Ciphertext) -> Ciphertext:
        """x ↦ x % msg_mod (reference message_extract, server_key/mod.rs:619)."""
        m = self.message_modulus
        out = self.evaluate_univariate(ct, lambda x: x % m)
        return out.with_(degree=min(m - 1, ct.degree))

    # ------------------------------------------------------------------
    # additive ops
    # ------------------------------------------------------------------

    def unchecked_add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        return a.with_(lwe=LweCiphertext(data=a.lwe.data + b.lwe.data),
                       degree=a.degree + b.degree,
                       noise_level=a.noise_level + b.noise_level)

    def checked_add(self, a, b):
        if a.degree + b.degree > self.max_degree:
            raise ValueError("CarryFull: add would overflow the carry buffer")
        return self.unchecked_add(a, b)

    def smart_add(self, a, b):
        if a.degree + b.degree > self.max_degree:
            a, b = self.message_extract(a), self.message_extract(b)
        return self.unchecked_add(a, b)

    def add(self, a, b):
        return self.message_extract(self.smart_add(a, b))

    def unchecked_neg(self, a: Ciphertext) -> Ciphertext:
        """-x via z*msg_mod - x with z = ceil((degree+1)/msg_mod)
        (reference unchecked_neg_with_correcting_term)."""
        m = self.message_modulus
        z = -(-(a.degree + 1) // m) * m          # multiple of msg_mod > degree
        data = (-a.lwe.data)
        data = data.at[..., -1].add(jnp.uint64(z) * delta_for(self.params))
        return a.with_(lwe=LweCiphertext(data=data), degree=z - 1)

    def smart_neg(self, a):
        if a.degree >= self.message_modulus * self.carry_modulus - self.message_modulus:
            a = self.message_extract(a)
        return self.unchecked_neg(a)

    def neg(self, a):
        return self.message_extract(self.smart_neg(a))

    def unchecked_sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        return self.unchecked_add(a, self.unchecked_neg(b))

    def smart_sub(self, a, b):
        nb = self.unchecked_neg(b if b.degree < self.message_modulus
                                else self.message_extract(b))
        if a.degree + nb.degree > self.max_degree:
            a = self.message_extract(a)
        return self.unchecked_add(a, nb)

    def sub(self, a, b):
        return self.message_extract(self.smart_sub(a, b))

    # ------------------------------------------------------------------
    # scalar ops
    # ------------------------------------------------------------------

    def unchecked_scalar_add(self, a: Ciphertext, scalar: int) -> Ciphertext:
        data = a.lwe.data.at[..., -1].add(jnp.uint64(scalar) * delta_for(self.params))
        return a.with_(lwe=LweCiphertext(data=data), degree=a.degree + scalar)

    def smart_scalar_add(self, a, scalar: int):
        if a.degree + scalar > self.max_degree:
            a = self.message_extract(a)
        return self.unchecked_scalar_add(a, scalar)

    def scalar_add(self, a, scalar: int):
        return self.message_extract(self.smart_scalar_add(a, scalar % self.message_modulus))

    def unchecked_scalar_mul(self, a: Ciphertext, scalar: int) -> Ciphertext:
        return a.with_(lwe=LweCiphertext(data=a.lwe.data * jnp.uint64(scalar)),
                       degree=a.degree * scalar,
                       noise_level=a.noise_level * max(scalar, 1))

    def smart_scalar_mul(self, a, scalar: int):
        if a.degree * scalar > self.max_degree:
            a = self.message_extract(a)
        if a.degree * scalar > self.max_degree:   # still too big: go through LUT
            return self.evaluate_univariate(a, lambda x: (x * scalar))
        return self.unchecked_scalar_mul(a, scalar)

    def scalar_mul(self, a, scalar: int):
        m = self.message_modulus
        return self.evaluate_univariate(a, lambda x: (x * scalar) % m)

    def scalar_sub(self, a, scalar: int):
        m = self.message_modulus
        return self.evaluate_univariate(a, lambda x: (x - scalar) % m)

    # ------------------------------------------------------------------
    # multiplicative / bitwise / comparison / shift ops (LUT based)
    # ------------------------------------------------------------------

    def unchecked_mul_lsb(self, a, b):
        m = self.message_modulus
        return self.smart_evaluate_bivariate(a, b, lambda x, y: (x * y) % m)

    def unchecked_mul_msb(self, a, b):
        m = self.message_modulus
        return self.smart_evaluate_bivariate(a, b, lambda x, y: (x * y) // m)

    def mul_lsb(self, a, b):
        return self.unchecked_mul_lsb(a, b)

    mul = mul_lsb

    def div(self, a, b):
        """Encrypted division; x/0 maps to msg_mod-1 like the reference."""
        m = self.message_modulus
        return self.smart_evaluate_bivariate(
            a, b, lambda x, y: (x // y) % m if y != 0 else m - 1)

    def scalar_div(self, a, scalar: int):
        m = self.message_modulus
        return self.evaluate_univariate(a, lambda x: (x // scalar) % m)

    def scalar_mod(self, a, scalar: int):
        return self.evaluate_univariate(a, lambda x: x % scalar)

    def bitand(self, a, b):
        return self.smart_evaluate_bivariate(a, b, lambda x, y: x & y)

    def bitor(self, a, b):
        return self.smart_evaluate_bivariate(a, b, lambda x, y: x | y)

    def bitxor(self, a, b):
        return self.smart_evaluate_bivariate(a, b, lambda x, y: x ^ y)

    def equal(self, a, b):
        return self.smart_evaluate_bivariate(a, b, lambda x, y: int(x == y))

    def not_equal(self, a, b):
        return self.smart_evaluate_bivariate(a, b, lambda x, y: int(x != y))

    def greater(self, a, b):
        return self.smart_evaluate_bivariate(a, b, lambda x, y: int(x > y))

    def greater_or_equal(self, a, b):
        return self.smart_evaluate_bivariate(a, b, lambda x, y: int(x >= y))

    def less(self, a, b):
        return self.smart_evaluate_bivariate(a, b, lambda x, y: int(x < y))

    def less_or_equal(self, a, b):
        return self.smart_evaluate_bivariate(a, b, lambda x, y: int(x <= y))

    def scalar_equal(self, a, scalar: int):
        return self.evaluate_univariate(a, lambda x: int(x == scalar))

    def scalar_greater(self, a, scalar: int):
        return self.evaluate_univariate(a, lambda x: int(x > scalar))

    def scalar_less(self, a, scalar: int):
        return self.evaluate_univariate(a, lambda x: int(x < scalar))

    def scalar_left_shift(self, a, shift: int):
        m = self.message_modulus
        return self.evaluate_univariate(a, lambda x: (x << shift) % m)

    def scalar_right_shift(self, a, shift: int):
        return self.evaluate_univariate(a, lambda x: x >> shift)

    # cmux on an encrypted boolean block (degree 1)
    def cmux(self, cond: Ciphertext, then_ct: Ciphertext, else_ct: Ciphertext):
        diff = self.sub(then_ct, else_ct)
        prod = self.mul(diff, cond)
        return self.add(prod, else_ct)


def gen_server_key(ck: ClientKey, key) -> ServerKey:
    """BSK (small→GLWE, classic or multi-bit per the parameter set) + KSK
    (big→small) (reference shortint engine new_server_key)."""
    from ..core.params import MultiBitPBSParameters
    p = ck.params
    k_bsk, k_ksk = rng.split(key)
    if isinstance(p, MultiBitPBSParameters):
        from ..core.algorithms.multi_bit import (
            generate_multi_bit_bootstrap_key, multi_bit_bootstrap_key_to_ntt)
        std = generate_multi_bit_bootstrap_key(
            k_bsk, ck.lwe_sk, ck.glwe_sk, p.pbs_decomp, p.grouping_factor,
            p.glwe_noise_std, LOG_Q)
        bsk = multi_bit_bootstrap_key_to_ntt(std, p.pbs_decomp,
                                             p.grouping_factor, LOG_Q)
    else:
        bsk_std = generate_bootstrap_key(k_bsk, ck.lwe_sk, ck.glwe_sk,
                                         p.pbs_decomp, p.glwe_noise_std, LOG_Q)
        npr = external_product_num_primes(p.polynomial_size, p.glwe_size,
                                          p.pbs_decomp, LOG_Q)
        bsk = bootstrap_key_to_ntt(bsk_std, LOG_Q, npr)
    ksk = generate_keyswitch_key(k_ksk, ck.big_sk, ck.lwe_sk, p.ks_decomp,
                                 p.lwe_noise_std, LOG_Q)
    return ServerKey(ksk=ksk, bsk=bsk, params=p)


@struct.dataclass
class CompressedServerKey:
    """Seed + bodies only (reference shortint CompressedServerKey,
    shortint/ciphertext/mod.rs:471-494): masks regenerate on decompression."""

    seeded_bsk: Any
    seeded_ksk: Any
    params: Any = struct.field(pytree_node=False, default=None)

    def decompress(self) -> "ServerKey":
        from ..core.algorithms.seeded import (decompress_bootstrap_key,
                                              decompress_keyswitch_key)
        p = self.params
        bsk_std = decompress_bootstrap_key(self.seeded_bsk)
        npr = external_product_num_primes(p.polynomial_size, p.glwe_size,
                                          p.pbs_decomp, LOG_Q)
        bsk = bootstrap_key_to_ntt(bsk_std, LOG_Q, npr)
        ksk = decompress_keyswitch_key(self.seeded_ksk)
        return ServerKey(ksk=ksk, bsk=bsk, params=p)


def gen_compressed_server_key(ck: ClientKey, seed: int = 0) -> CompressedServerKey:
    """Compressed twin of gen_server_key: (k+1)x smaller BSK, (n+1)x smaller
    KSK on the wire."""
    from ..core.algorithms.seeded import (generate_seeded_bootstrap_key,
                                          generate_seeded_keyswitch_key)
    p = ck.params
    _, seeded_bsk = generate_seeded_bootstrap_key(
        seed * 2 + 1, ck.lwe_sk, ck.glwe_sk, p.pbs_decomp,
        p.glwe_noise_std, LOG_Q)
    _, seeded_ksk = generate_seeded_keyswitch_key(
        seed * 2 + 2, ck.big_sk, ck.lwe_sk, p.ks_decomp,
        p.lwe_noise_std, LOG_Q)
    return CompressedServerKey(seeded_bsk=seeded_bsk, seeded_ksk=seeded_ksk,
                               params=p)
