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
from .ciphertext import CheckError, Ciphertext, MaxNoiseLevel, NoiseLevel
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

    @property
    def max_noise_level(self) -> MaxNoiseLevel:
        """Enforced maximum noise level (reference ServerKey holds this from
        the parameter set, shortint/server_key/mod.rs:284-300)."""
        return MaxNoiseLevel.from_msg_carry_modulus(self.message_modulus,
                                                    self.carry_modulus)

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

    def generate_lookup_table_raw(self, values) -> LookupTable:
        """Accumulator whose box for input value i holds the RAW torus
        constant values[i] (no delta scaling) — circuit-bootstrap level LUTs
        emit bit * q/B^l directly this way, skipping the reference's separate
        homomorphic_shift_boolean PBS (fft64/crypto/wop_pbs/mod.rs:370)."""
        p = self.message_modulus * self.carry_modulus
        n_poly = self.params.polynomial_size
        box = n_poly // p
        vals = np.asarray(values, dtype=np.uint64)
        assert vals.shape == (p,)
        poly = np.repeat(vals, box)
        poly = np.roll(poly, -(box // 2))
        poly[-(box // 2):] = np.uint64(0) - poly[-(box // 2):]
        acc = trivial_glwe(jnp.asarray(poly), self.params.glwe_dimension, LOG_Q)
        return LookupTable(acc=acc, degree=p - 1)

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
                interp = config.pallas_interpret()
                if (config.use_fused_rotation()
                        and self.bsk.u32_order == "fourstep"):
                    rotated = GlweCiphertext(data=blind_rotate_fused(
                        acc.data, lwe.data, self.bsk.data_u32,
                        self.bsk.shoup_u32, self.bsk.mono,
                        self.bsk.mono_shoup, self.bsk.decomp, log_q=LOG_Q,
                        block_b=block_b, mode="multibit",
                        grouping=self.bsk.grouping_factor, interpret=interp))
                    return sample_extract(rotated, 0)
                rotated = GlweCiphertext(data=multi_bit_blind_rotate_pallas(
                    acc.data, lwe.data, self.bsk.data_u32, self.bsk.shoup_u32,
                    self.bsk.decomp, self.bsk.grouping_factor, log_q=LOG_Q,
                    block_b=block_b,
                    mxu=self.bsk.u32_order.startswith("fourstep"),
                    lanes=(self.bsk.u32_order == "fourstep-lanes"),
                    mono_tab=self.bsk.mono, mono_sh=self.bsk.mono_shoup,
                    interpret=interp))
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

    def generate_lookup_table_bivariate_with_factor(
            self, f: Callable[[int, int], int], factor: int) -> LookupTable:
        """LUT over (left * factor + right) where factor may be smaller than
        msg_mod — lets a degree-bounded right operand pack more tightly
        (reference generate_lookup_table_bivariate_with_factor,
        shortint/server_key/bivariate_pbs.rs)."""
        return self.generate_lookup_table(lambda x: f(x // factor, x % factor))

    def unchecked_bivariate_pack_with_factor(self, left: Ciphertext,
                                             right: Ciphertext,
                                             factor: int) -> Ciphertext:
        """left * factor + right — requires right.degree < factor and
        left.degree * factor + right.degree ≤ max_degree."""
        data = left.lwe.data * jnp.uint64(factor) + right.lwe.data
        return left.with_(lwe=LweCiphertext(data=data),
                          degree=left.degree * factor + right.degree,
                          noise_level=left.noise_level * factor + right.noise_level)

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
        if right.degree >= m or not self._noise_ok(right.noise_level):
            right = self.message_extract(right)
        if not self.is_bivariate_pbs_possible(left, right):
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
            raise CheckError("CarryFull: add would overflow the carry buffer")
        self.max_noise_level.validate(a.noise_level + b.noise_level)
        return self.unchecked_add(a, b)

    def smart_add(self, a, b):
        if not self.is_add_possible(a, b):
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
        if (a.degree >= self.message_modulus * self.carry_modulus
                - self.message_modulus or not self._noise_ok(a.noise_level)):
            a = self.message_extract(a)
        return self.unchecked_neg(a)

    def neg(self, a):
        return self.message_extract(self.smart_neg(a))

    def unchecked_sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        return self.unchecked_add(a, self.unchecked_neg(b))

    def smart_sub(self, a, b):
        nb = self.unchecked_neg(
            b if b.degree < self.message_modulus
            and self._noise_ok(b.noise_level) else self.message_extract(b))
        if not self.is_add_possible(a, nb):
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
        if not self.is_scalar_add_possible(a, scalar):
            a = self.message_extract(a)
        return self.unchecked_scalar_add(a, scalar)

    def scalar_add(self, a, scalar: int):
        return self.message_extract(self.smart_scalar_add(a, scalar % self.message_modulus))

    def unchecked_scalar_mul(self, a: Ciphertext, scalar: int) -> Ciphertext:
        return a.with_(lwe=LweCiphertext(data=a.lwe.data * jnp.uint64(scalar)),
                       degree=a.degree * scalar,
                       noise_level=a.noise_level * max(scalar, 1))

    def smart_scalar_mul(self, a, scalar: int):
        if not self.is_scalar_mul_possible(a, scalar):
            a = self.message_extract(a)
        if not self.is_scalar_mul_possible(a, scalar):  # still too big: LUT
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

    # ------------------------------------------------------------------
    # precondition predicates (reference is_*_possible, shortint/server_key)
    # ------------------------------------------------------------------

    def _noise_ok(self, noise_level: int) -> bool:
        return noise_level <= self.max_noise_level.value

    def is_add_possible(self, a, b) -> bool:
        """Degree AND noise-level validation (reference is_add_possible,
        add.rs:270-280: max_degree.validate + max_noise_level.validate)."""
        return (a.degree + b.degree <= self.max_degree
                and self._noise_ok(a.noise_level + b.noise_level))

    def is_neg_possible(self, a) -> bool:
        m = self.message_modulus
        return (-(-(a.degree + 1) // m) * m - 1 <= self.max_degree
                and self._noise_ok(a.noise_level))

    def is_sub_possible(self, a, b) -> bool:
        m = self.message_modulus
        z = -(-(b.degree + 1) // m) * m
        return (a.degree + z - 1 <= self.max_degree
                and self._noise_ok(a.noise_level + b.noise_level))

    def is_scalar_add_possible(self, a, scalar: int) -> bool:
        return (a.degree + scalar <= self.max_degree
                and self._noise_ok(a.noise_level))

    def is_scalar_sub_possible(self, a, scalar: int) -> bool:
        return scalar <= a.degree and self._noise_ok(a.noise_level)

    def is_scalar_mul_possible(self, a, scalar: int) -> bool:
        return (a.degree * scalar <= self.max_degree
                and self._noise_ok(a.noise_level * max(scalar, 1)))

    def is_scalar_left_shift_possible(self, a, shift: int) -> bool:
        return (a.degree << shift <= self.max_degree
                and self._noise_ok(a.noise_level * (1 << shift)))

    def is_bivariate_pbs_possible(self, a, b) -> bool:
        """left·m + right must fit the LUT domain
        (reference is_bivariate_pbs_possible, bivariate_pbs.rs); the packing
        is a scalar-mul + add, so noise validates as a.noise·m + b.noise."""
        m = self.message_modulus
        return (b.degree < m and a.degree * m + b.degree <= self.max_degree
                and self._noise_ok(a.noise_level * m + b.noise_level))

    def is_mul_possible(self, a, b) -> bool:
        return self.is_bivariate_pbs_possible(a, b)

    def is_mul_small_carry_possible(self, a, b) -> bool:
        return (a.degree + b.degree <= self.max_degree
                and self.is_sub_possible(a, b))

    def _check_bivariate(self, a, b):
        if not self.is_bivariate_pbs_possible(a, b):
            raise CheckError(
                "CarryFull/NoiseTooBig: bivariate PBS precondition failed")

    # ------------------------------------------------------------------
    # trivial encryption on the server (reference create_trivial, mod.rs)
    # ------------------------------------------------------------------

    def create_trivial(self, values) -> Ciphertext:
        """Noiseless encryption of values % msg_mod under the key layout the
        server's ops expect (reference ServerKey::create_trivial)."""
        from ..core.algorithms import trivial_lwe
        from ..core.params import EncryptionKeyChoice
        from .client_key import delta_for
        p = self.params
        m = self.message_modulus
        msgs = jnp.asarray(values).astype(jnp.uint64) % jnp.uint64(m)
        n = (p.glwe_dimension * p.polynomial_size
             if p.encryption_key_choice == EncryptionKeyChoice.BIG
             else p.lwe_dimension)
        return Ciphertext(lwe=trivial_lwe(msgs * delta_for(p), n, LOG_Q),
                          degree=m - 1, message_modulus=m,
                          carry_modulus=self.carry_modulus,
                          noise_level=NoiseLevel.ZERO)

    def unchecked_create_trivial(self, values) -> Ciphertext:
        """Trivial over the full message+carry space (degree = p−1)."""
        from ..core.algorithms import trivial_lwe
        from ..core.params import EncryptionKeyChoice
        from .client_key import delta_for
        p = self.params
        space = self.message_modulus * self.carry_modulus
        msgs = jnp.asarray(values).astype(jnp.uint64) % jnp.uint64(space)
        n = (p.glwe_dimension * p.polynomial_size
             if p.encryption_key_choice == EncryptionKeyChoice.BIG
             else p.lwe_dimension)
        return Ciphertext(lwe=trivial_lwe(msgs * delta_for(p), n, LOG_Q),
                          degree=space - 1, message_modulus=self.message_modulus,
                          carry_modulus=self.carry_modulus,
                          noise_level=NoiseLevel.ZERO)

    # ------------------------------------------------------------------
    # correcting-term subtraction (reference *_with_correcting_term,
    # shortint/server_key/{sub,neg}.rs)
    # ------------------------------------------------------------------

    def unchecked_neg_with_correcting_term(self, a):
        """→ (−a + z·Δ ciphertext, z) where z is the msg_mod multiple added
        to keep the torus value positive."""
        m = self.message_modulus
        z = -(-(a.degree + 1) // m) * m
        out = self.unchecked_neg(a)
        return out, z

    def unchecked_sub_with_correcting_term(self, a, b):
        nb, z = self.unchecked_neg_with_correcting_term(b)
        return self.unchecked_add(a, nb), z

    def smart_sub_with_correcting_term(self, a, b):
        if b.degree >= self.message_modulus:
            b = self.message_extract(b)
        nb, z = self.unchecked_neg_with_correcting_term(b)
        if a.degree + nb.degree > self.max_degree:
            a = self.message_extract(a)
        return self.unchecked_add(a, nb), z

    # ------------------------------------------------------------------
    # multiplication family (reference mul.rs)
    # ------------------------------------------------------------------

    def checked_mul_lsb(self, a, b):
        self._check_bivariate(a, b)
        return self.unchecked_apply_lookup_table_bivariate(
            a, b, self.generate_bivariate_lookup_table(
                lambda x, y: (x * y) % self.message_modulus))

    def smart_mul_lsb(self, a, b):
        return self.unchecked_mul_lsb(a, b)

    def smart_mul_msb(self, a, b):
        return self.unchecked_mul_msb(a, b)

    def mul_msb(self, a, b):
        return self.unchecked_mul_msb(a, b)

    def checked_mul_msb(self, a, b):
        self._check_bivariate(a, b)
        return self.unchecked_apply_lookup_table_bivariate(
            a, b, self.generate_bivariate_lookup_table(
                lambda x, y: (x * y) // self.message_modulus))

    def unchecked_mul_lsb_small_carry(self, a, b):
        """a·b mod m via the quarter-square identity
        ((a+b)² − (a−b)²)/4 — two univariate PBS instead of one bivariate,
        usable when carry_modulus < message_modulus (reference
        unchecked_mul_lsb_small_carry_modulus_assign, mul.rs)."""
        m = self.message_modulus
        s = self.unchecked_add(a, b)
        d, z = self.unchecked_sub_with_correcting_term(a, b)
        w = 1 << 64
        ls = self.evaluate_univariate(s, lambda x: (x * x) % w // 4 % m)
        ld = self.evaluate_univariate(
            d, lambda x: ((x - z) % w) ** 2 % w // 4 % m)
        return self.unchecked_sub(ls, ld)

    def checked_mul_lsb_with_small_carry(self, a, b):
        if not self.is_mul_small_carry_possible(a, b):
            raise CheckError("CarryFull: small-carry mul would overflow")
        return self.unchecked_mul_lsb_small_carry(a, b)

    # ------------------------------------------------------------------
    # bitwise family (reference bitwise_op.rs)
    # ------------------------------------------------------------------

    def unchecked_bitand(self, a, b):
        return self.unchecked_apply_lookup_table_bivariate(
            a, b, self.generate_bivariate_lookup_table(lambda x, y: x & y))

    def unchecked_bitor(self, a, b):
        return self.unchecked_apply_lookup_table_bivariate(
            a, b, self.generate_bivariate_lookup_table(lambda x, y: x | y))

    def unchecked_bitxor(self, a, b):
        return self.unchecked_apply_lookup_table_bivariate(
            a, b, self.generate_bivariate_lookup_table(lambda x, y: x ^ y))

    def checked_bitand(self, a, b):
        self._check_bivariate(a, b)
        return self.unchecked_bitand(a, b)

    def checked_bitor(self, a, b):
        self._check_bivariate(a, b)
        return self.unchecked_bitor(a, b)

    def checked_bitxor(self, a, b):
        self._check_bivariate(a, b)
        return self.unchecked_bitxor(a, b)

    smart_bitand = bitand
    smart_bitor = bitor
    smart_bitxor = bitxor

    def scalar_bitand(self, a, scalar: int):
        return self.evaluate_univariate(a, lambda x: x & scalar)

    def scalar_bitor(self, a, scalar: int):
        m = self.message_modulus
        return self.evaluate_univariate(a, lambda x: (x % m) | (scalar % m))

    def scalar_bitxor(self, a, scalar: int):
        m = self.message_modulus
        return self.evaluate_univariate(a, lambda x: (x % m) ^ (scalar % m))

    smart_scalar_bitand = scalar_bitand
    smart_scalar_bitor = scalar_bitor
    smart_scalar_bitxor = scalar_bitxor

    # ------------------------------------------------------------------
    # comparison family (reference comp_op.rs) — smart_* prepare operands,
    # unchecked_* assume the bivariate domain fits, checked_* raise
    # ------------------------------------------------------------------

    def _cmp_lut(self, op):
        return self.generate_bivariate_lookup_table(lambda x, y: int(op(x, y)))

    def _unchecked_cmp(self, a, b, op):
        return self.unchecked_apply_lookup_table_bivariate(a, b, self._cmp_lut(op))

    def _checked_cmp(self, a, b, op):
        self._check_bivariate(a, b)
        return self._unchecked_cmp(a, b, op)

    def unchecked_equal(self, a, b):
        return self._unchecked_cmp(a, b, lambda x, y: x == y)

    def unchecked_not_equal(self, a, b):
        return self._unchecked_cmp(a, b, lambda x, y: x != y)

    def unchecked_greater(self, a, b):
        return self._unchecked_cmp(a, b, lambda x, y: x > y)

    def unchecked_greater_or_equal(self, a, b):
        return self._unchecked_cmp(a, b, lambda x, y: x >= y)

    def unchecked_less(self, a, b):
        return self._unchecked_cmp(a, b, lambda x, y: x < y)

    def unchecked_less_or_equal(self, a, b):
        return self._unchecked_cmp(a, b, lambda x, y: x <= y)

    def checked_equal(self, a, b):
        return self._checked_cmp(a, b, lambda x, y: x == y)

    def checked_not_equal(self, a, b):
        return self._checked_cmp(a, b, lambda x, y: x != y)

    def checked_greater(self, a, b):
        return self._checked_cmp(a, b, lambda x, y: x > y)

    def checked_greater_or_equal(self, a, b):
        return self._checked_cmp(a, b, lambda x, y: x >= y)

    def checked_less(self, a, b):
        return self._checked_cmp(a, b, lambda x, y: x < y)

    def checked_less_or_equal(self, a, b):
        return self._checked_cmp(a, b, lambda x, y: x <= y)

    smart_equal = equal
    smart_not_equal = not_equal
    smart_greater = greater
    smart_greater_or_equal = greater_or_equal
    smart_less = less
    smart_less_or_equal = less_or_equal

    def scalar_greater_or_equal(self, a, scalar: int):
        return self.evaluate_univariate(a, lambda x: int(x >= scalar))

    def scalar_less_or_equal(self, a, scalar: int):
        return self.evaluate_univariate(a, lambda x: int(x <= scalar))

    def scalar_not_equal(self, a, scalar: int):
        return self.evaluate_univariate(a, lambda x: int(x != scalar))

    smart_scalar_equal = scalar_equal
    smart_scalar_not_equal = scalar_not_equal
    smart_scalar_greater = scalar_greater
    smart_scalar_greater_or_equal = scalar_greater_or_equal
    smart_scalar_less = scalar_less
    smart_scalar_less_or_equal = scalar_less_or_equal

    # ------------------------------------------------------------------
    # division family (reference div_mod.rs)
    # ------------------------------------------------------------------

    def unchecked_div(self, a, b):
        m = self.message_modulus
        return self.unchecked_apply_lookup_table_bivariate(
            a, b, self.generate_bivariate_lookup_table(
                lambda x, y: (x // y) % m if y != 0 else m - 1))

    smart_div = div

    def unchecked_scalar_div(self, a, scalar: int):
        if scalar == 0:
            raise ZeroDivisionError("shortint scalar_div by zero")
        return self.scalar_div(a, scalar)

    def unchecked_scalar_mod(self, a, scalar: int):
        if scalar == 0:
            raise ZeroDivisionError("shortint scalar_mod by zero")
        return self.scalar_mod(a, scalar)

    # ------------------------------------------------------------------
    # shift family (reference shift.rs) — left shift is a plain scalar
    # multiply by 2^shift (degree grows into the carry); right shift is a LUT
    # ------------------------------------------------------------------

    def unchecked_scalar_left_shift(self, a, shift: int):
        return self.unchecked_scalar_mul(a, 1 << shift)

    def checked_scalar_left_shift(self, a, shift: int):
        if not self.is_scalar_left_shift_possible(a, shift):
            raise ValueError("CarryFull: left shift would overflow")
        return self.unchecked_scalar_left_shift(a, shift)

    def smart_scalar_left_shift(self, a, shift: int):
        if not self.is_scalar_left_shift_possible(a, shift):
            a = self.message_extract(a)
        if not self.is_scalar_left_shift_possible(a, shift):
            m = self.message_modulus
            return self.evaluate_univariate(a, lambda x: (x << shift) % m)
        return self.unchecked_scalar_left_shift(a, shift)

    def unchecked_scalar_right_shift(self, a, shift: int):
        out = self.evaluate_univariate(a, lambda x: x >> shift)
        return out.with_(degree=a.degree >> shift)

    smart_scalar_right_shift = unchecked_scalar_right_shift

    # ------------------------------------------------------------------
    # misc parity accessors (reference mod.rs:300-370)
    # ------------------------------------------------------------------

    def evaluate_msg_univariate(self, ct, f):
        """LUT of f mod msg_mod (reference evaluate_msg_univariate_function)."""
        return self.apply_lookup_table(ct, self.generate_msg_lookup_table(f))

    evaluate_msg_univariate_function = evaluate_msg_univariate

    # smart scalar comparisons: operands are immutable pytrees here, so the
    # reference's smart_* (clean-in-place-then-compare) collapses onto the
    # default family (which bootstraps internally when needed)
    smart_scalar_equal = scalar_equal
    smart_scalar_not_equal = scalar_not_equal
    smart_scalar_greater = scalar_greater
    smart_scalar_greater_or_equal = scalar_greater_or_equal
    smart_scalar_less = scalar_less
    smart_scalar_less_or_equal = scalar_less_or_equal

    def deterministic_pbs_execution(self) -> bool:
        """Always True on TPU: every path is deterministic by construction
        (reference toggles a multi-bit thread-pool mode, mod.rs:253-270)."""
        return True

    def set_deterministic_pbs_execution(self, det: bool) -> None:
        if not det:
            raise ValueError("non-deterministic PBS does not exist on TPU")

    def bootstrapping_key_size_elements(self) -> int:
        import math
        return math.prod(self.bsk.data.shape)

    def bootstrapping_key_size_bytes(self) -> int:
        return self.bootstrapping_key_size_elements() * self.bsk.data.dtype.itemsize

    def key_switching_key_size_elements(self) -> int:
        import math
        return math.prod(self.ksk.data.shape)

    def key_switching_key_size_bytes(self) -> int:
        return self.key_switching_key_size_elements() * self.ksk.data.dtype.itemsize

    # parameter accessors (reference shortint/server_key/mod.rs) -----------

    def input_lwe_dimension(self) -> int:
        return self.params.lwe_dimension

    def output_lwe_dimension(self) -> int:
        return self.params.glwe_dimension * self.params.polynomial_size

    def glwe_size(self) -> int:
        return self.params.glwe_dimension + 1

    def polynomial_size(self) -> int:
        return self.params.polynomial_size

    def decomposition_base_log(self) -> int:
        return self.params.pbs_base_log

    def decomposition_level_count(self) -> int:
        return self.params.pbs_level


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
