"""Radix integer server ops.

Reference: tfhe/src/integer/server_key/ (radix & radix_parallel).  The
reference parallelizes across blocks with rayon joins; here independent
block PBS calls are *stacked onto the batch axis* and issued as one
bootstrap — the TPU equivalent of radix_parallel (SURVEY.md §2.9 table).

Costs (b = num_blocks): add_parallelized = Hillis–Steele carry scan in
log₂(b)+3 batched PBS layers (`add` keeps the b-step sequential path);
mul = one batched PBS for all 2b² partial products + chunked accumulation;
comparisons = log₂(b) batched tree layers.
"""
from __future__ import annotations

import math
from typing import Any, Callable, List, Sequence

import flax.struct as struct
import jax.numpy as jnp
import numpy as np

from .. import shortint
from ..core import rng
from ..core.entities import LweCiphertext
from ..shortint.ciphertext import Ciphertext as Block
from ..shortint.ciphertext import NoiseLevel
from ..shortint.client_key import delta_for
from ..shortint.server_key import LookupTable
from .ciphertext import BooleanBlock, CrtCiphertext, RadixCiphertext, SignedRadixCiphertext
from .client_key import CrtClientKey, RadixClientKey

# comparison fold states
EQ, LT, GT = 0, 1, 2


@struct.dataclass
class ServerKey:
    key: shortint.ServerKey
    # optional GGSW-selector shift key (integer/shift_key.py); None keeps the
    # layered exclusive-selection path for encrypted-amount shifts
    shift_key: Any = None

    @property
    def msg_mod(self) -> int:
        return self.key.message_modulus

    @property
    def max_degree(self) -> int:
        return self.key.max_degree

    # ------------------------------------------------------------------
    # batched-LUT plumbing: stack blocks into the PBS batch axis
    # ------------------------------------------------------------------

    def _apply_luts_stacked(self, blocks: List[Block],
                            luts: List[LookupTable],
                            sk: shortint.ServerKey = None) -> List[Block]:
        """One KS+PBS for len(blocks) inputs (possibly distinct LUTs).
        `sk` overrides the shortint key (e.g. the wopbs-regime or casting
        server keys of the GGSW shift path)."""
        assert len(blocks) == len(luts)
        if sk is None:
            sk = self.key
        data = jnp.stack([b.lwe.data for b in blocks], axis=0)   # [nb, ..., n+1]
        inner = data.ndim - 2
        acc = jnp.stack([l.acc.data for l in luts], axis=0)      # [nb, k+1, N]
        acc = acc.reshape(acc.shape[:1] + (1,) * inner + acc.shape[-2:])
        tmp = Block(lwe=LweCiphertext(data=data),
                    degree=max(b.degree for b in blocks),
                    message_modulus=blocks[0].message_modulus,
                    carry_modulus=blocks[0].carry_modulus,
                    noise_level=max(b.noise_level for b in blocks))
        from ..core.entities import GlweCiphertext
        out = sk.apply_lookup_table(
            tmp, LookupTable(acc=GlweCiphertext(data=acc), degree=0))
        return [blocks[i].with_(
                    lwe=LweCiphertext(data=out.lwe.data[i]),
                    degree=luts[i].degree, noise_level=NoiseLevel.NOMINAL)
                for i in range(len(blocks))]

    def _apply_lut_same(self, blocks: List[Block], lut: LookupTable) -> List[Block]:
        return self._apply_luts_stacked(blocks, [lut] * len(blocks))

    # ------------------------------------------------------------------
    # carry machinery
    # ------------------------------------------------------------------

    def full_propagate(self, ct: RadixCiphertext) -> RadixCiphertext:
        """Sequential carry propagation (reference full_propagate): each step
        extracts (message, carry) of one block with a single 2-LUT batched
        PBS and feeds the carry forward."""
        m = self.msg_mod
        lut_msg = self.key.generate_lookup_table(lambda x: x % m)
        lut_carry = self.key.generate_lookup_table(lambda x: x // m)
        out = []
        carry = None
        last = len(ct.blocks) - 1
        for i, b in enumerate(ct.blocks):
            if carry is not None:
                b = self.key.unchecked_add(b, carry)
            if b.degree < m:
                out.append(b)
                carry = None
                continue
            if i == last:  # the top block's carry is discarded: 1 LUT not 2
                out.append(self._apply_luts_stacked([b], [lut_msg])[0])
                carry = None
                continue
            msg, carry = self._apply_luts_stacked([b, b], [lut_msg, lut_carry])
            carry = carry.with_(degree=min(carry.degree, b.degree // m))
            out.append(msg)
        return type(ct)(blocks=out)

    def full_propagate_parallelized(self, ct: RadixCiphertext) -> RadixCiphertext:
        """Hillis–Steele carry propagation (reference
        radix_parallel/add.rs:541-607): per-block (generate/propagate) states,
        a log₂(b)-depth inclusive scan of batched combine-LUT layers, then one
        final (message + carry_in) extraction layer.  Requires block values
        ≤ 2m-1 (i.e. the sum of two clean operands)."""
        m = self.msg_mod
        nb = ct.num_blocks
        if nb == 1 or any(b.degree > 2 * m - 1 for b in ct.blocks):
            return self.full_propagate(ct)
        NONE_, GEN, PROP = 0, 1, 2
        lut_state = self.key.generate_lookup_table(
            lambda v: GEN if v >= m else (PROP if v == m - 1 else NONE_))
        states = self._apply_lut_same(ct.blocks, lut_state)

        # inclusive scan with operator: a∘b = a if a != PROP else b
        lut_combine = self.key.generate_lookup_table(
            lambda x: (x // 4) if (x // 4) != PROP else (x % 4))
        dist = 1
        while dist < nb:
            packed, idxs = [], []
            for i in range(nb):
                if i - dist >= 0:
                    hi, lo = states[i], states[i - dist]
                    packed.append(hi.with_(
                        lwe=LweCiphertext(data=hi.lwe.data * jnp.uint64(4)
                                          + lo.lwe.data),
                        degree=hi.degree * 4 + lo.degree,
                        noise_level=hi.noise_level * 4 + lo.noise_level))
                    idxs.append(i)
            outs = self._apply_lut_same(packed, lut_combine)
            for i, o in zip(idxs, outs):
                states[i] = o
            dist *= 2

        # prefix state → carry bit (one more batched layer), then resolve
        # message + carry_in with packing bit*(2m) + v ≤ 2m*1 + 2m-1 ≤ max
        lut_bit = self.key.generate_lookup_table(lambda x: 1 if x == GEN else 0)
        bits = self._apply_lut_same(states[:-1], lut_bit)
        lut_resolve = self.key.generate_lookup_table(
            lambda x: ((x % (2 * m)) + (x // (2 * m))) % m)
        packed = [ct.blocks[0]]
        for i in range(1, nb):
            c = bits[i - 1]
            packed.append(ct.blocks[i].with_(
                lwe=LweCiphertext(data=c.lwe.data * jnp.uint64(2 * m)
                                  + ct.blocks[i].lwe.data),
                degree=c.degree * 2 * m + ct.blocks[i].degree,
                noise_level=c.noise_level * 2 * m
                + ct.blocks[i].noise_level))
        lut_msg0 = self.key.generate_lookup_table(lambda x: x % m)
        outs = self._apply_luts_stacked(
            packed, [lut_msg0] + [lut_resolve] * (nb - 1))
        return type(ct)(blocks=outs)

    def _maybe_propagate(self, ct: RadixCiphertext) -> RadixCiphertext:
        if ct.block_carries_are_empty():
            return ct
        return self.full_propagate(ct)

    # ------------------------------------------------------------------
    # add / neg / sub
    # ------------------------------------------------------------------

    def unchecked_add(self, a: RadixCiphertext, b: RadixCiphertext) -> RadixCiphertext:
        return type(a)(blocks=[self.key.unchecked_add(x, y)
                               for x, y in zip(a.blocks, b.blocks)])

    def smart_add(self, a, b):
        if any(x.degree + y.degree > self.max_degree
               for x, y in zip(a.blocks, b.blocks)):
            a, b = self._maybe_propagate(a), self._maybe_propagate(b)
        return self.unchecked_add(a, b)

    def add(self, a, b):
        return self.full_propagate(self.smart_add(a, b))

    def add_parallelized(self, a, b):
        """Log-depth add: blockwise sum + Hillis–Steele carry scan."""
        a, b = self._maybe_propagate(a), self._maybe_propagate(b)
        return self.full_propagate_parallelized(self.unchecked_add(a, b))

    def unchecked_neg(self, a: RadixCiphertext) -> RadixCiphertext:
        """Blockwise negation with correcting terms: block_i' = w_i*Δ - block_i
        with w_i = z_i - z_{i-1}/m, z_i the smallest multiple of m above
        degree_i (reference unchecked_neg_with_correcting_term)."""
        m = self.msg_mod
        delta = delta_for(self.key.params)
        out = []
        prev_carry = 0
        for blk in a.blocks:
            z = max(-(-(blk.degree + 1) // m) * m, m)
            w = z - prev_carry
            data = (-blk.lwe.data)
            data = data.at[..., -1].add(jnp.uint64(w) * delta)
            out.append(blk.with_(lwe=LweCiphertext(data=data), degree=w))
            prev_carry = z // m
        return type(a)(blocks=out)

    def smart_neg(self, a):
        return self.unchecked_neg(self._maybe_propagate(a))

    def neg(self, a):
        return self.full_propagate(self.smart_neg(a))

    neg_parallelized = neg

    def unchecked_sub(self, a, b):
        return self.unchecked_add(a, self.unchecked_neg(b))

    def smart_sub(self, a, b):
        return self.smart_add(a, self.smart_neg(b))

    def sub(self, a, b):
        return self.full_propagate(self.smart_sub(
            self._maybe_propagate(a), self._maybe_propagate(b)))

    sub_parallelized = sub

    # ------------------------------------------------------------------
    # scalar add/sub/mul
    # ------------------------------------------------------------------

    def _scalar_blocks(self, scalar: int, nb: int) -> List[int]:
        m = self.msg_mod
        scalar %= m ** nb
        return [(scalar // m ** i) % m for i in range(nb)]

    def scalar_add(self, a: RadixCiphertext, scalar: int) -> RadixCiphertext:
        a = self._maybe_propagate(a)
        sb = self._scalar_blocks(scalar, a.num_blocks)
        blocks = [self.key.unchecked_scalar_add(x, s) if s else x
                  for x, s in zip(a.blocks, sb)]
        return self.full_propagate(type(a)(blocks=blocks))

    scalar_add_parallelized = scalar_add

    def scalar_sub(self, a: RadixCiphertext, scalar: int) -> RadixCiphertext:
        nb = a.num_blocks
        return self.scalar_add(a, (-scalar) % (self.msg_mod ** nb))

    scalar_sub_parallelized = scalar_sub

    def scalar_mul(self, a: RadixCiphertext, scalar: int) -> RadixCiphertext:
        """Shift-and-add over the scalar's radix digits."""
        nb = a.num_blocks
        scalar %= self.msg_mod ** nb
        if scalar == 0:
            return self.create_trivial_zero_radix(nb, a.batch_shape)
        a = self._maybe_propagate(a)
        partials = []
        for i, s in enumerate(self._scalar_blocks(scalar, nb)):
            if s == 0:
                continue
            shifted = self.blockshift(a, i)
            mul_lut = self.key.generate_lookup_table(lambda x, s=s: x * s)
            inner = self._apply_lut_same(shifted.blocks[i:], mul_lut)
            partials.append(type(a)(blocks=shifted.blocks[:i] + inner))
        return self._sum_partials(partials)

    scalar_mul_parallelized = scalar_mul

    # ------------------------------------------------------------------
    # multiplication
    # ------------------------------------------------------------------

    def mul(self, a: RadixCiphertext, b: RadixCiphertext) -> RadixCiphertext:
        """Schoolbook block multiplication: all lsb/msb partial products in
        ONE batched bivariate PBS, then chunked accumulation (reference
        radix_parallel/mul.rs:329 fan-out becomes a batch axis).

        Measured negative result (round 3): emitting the FULL product
        lsb + m·msb with ONE PBS per pair (136 instead of 256 partials)
        loses — the degree-9 partials exhaust the carry budget after ~1.6
        additions instead of ~5, and the extra propagation extractions cost
        more than the 120 saved partials (488 vs 431 ms/op on chip)."""
        a, b = self._maybe_propagate(a), self._maybe_propagate(b)
        nb = a.num_blocks
        m = self.msg_mod
        lut_lsb = self.key.generate_lookup_table(lambda x: ((x // m) * (x % m)) % m)
        lut_msb = self.key.generate_lookup_table(lambda x: ((x // m) * (x % m)) // m)

        pairs, luts, places = [], [], []
        for j in range(nb):
            for i in range(nb):
                if i + j < nb:
                    pairs.append(self.key.unchecked_bivariate_pack(a.blocks[i], b.blocks[j]))
                    luts.append(lut_lsb)
                    places.append(i + j)
                if i + j + 1 < nb:
                    pairs.append(self.key.unchecked_bivariate_pack(a.blocks[i], b.blocks[j]))
                    luts.append(lut_msb)
                    places.append(i + j + 1)
        outs = self._apply_luts_stacked(pairs, luts)

        # group into radix partial ciphertexts by output place
        per_place: List[List[Block]] = [[] for _ in range(nb)]
        for blk, pl in zip(outs, places):
            per_place[pl].append(blk)
        partials = []
        depth = max(len(v) for v in per_place)
        for d in range(depth):
            blocks = []
            for pl in range(nb):
                if d < len(per_place[pl]):
                    blocks.append(per_place[pl][d])
                else:
                    blocks.append(self._trivial_zero_block(a.batch_shape))
            partials.append(type(a)(blocks=blocks))
        return self._sum_partials(partials)

    mul_parallelized = mul

    def _trivial_zero_block(self, batch_shape) -> Block:
        p = self.key.params
        from ..core.algorithms import trivial_lwe
        from ..core.params import EncryptionKeyChoice
        n = (p.big_lwe_dimension
             if p.encryption_key_choice == EncryptionKeyChoice.BIG
             else p.lwe_dimension)
        zeros = jnp.zeros(batch_shape, dtype=jnp.uint64)
        return Block(lwe=trivial_lwe(zeros, n, 64), degree=0,
                     message_modulus=p.message_modulus,
                     carry_modulus=p.carry_modulus,
                     noise_level=NoiseLevel.ZERO)

    def create_trivial_zero_radix(self, nb: int, batch_shape=()) -> RadixCiphertext:
        return RadixCiphertext(blocks=[self._trivial_zero_block(batch_shape)
                                       for _ in range(nb)])

    def create_trivial_radix(self, value: int, nb: int, batch_shape=()) -> RadixCiphertext:
        m = self.msg_mod
        delta = delta_for(self.key.params)
        ct = self.create_trivial_zero_radix(nb, batch_shape)
        blocks = []
        for i, blk in enumerate(ct.blocks):
            s = (value // m ** i) % m
            data = blk.lwe.data.at[..., -1].add(jnp.uint64(s) * delta)
            blocks.append(blk.with_(lwe=LweCiphertext(data=data), degree=s))
        return RadixCiphertext(blocks=blocks)

    def _split_msg_carry(self, ct: RadixCiphertext):
        """(message part, carries shifted up one place) of a saturated
        accumulator, extracting both with ONE stacked PBS round.  Blocks with
        empty carry space skip their PBS entirely (their carry is a trivial
        zero)."""
        m = self.msg_mod
        nb = ct.num_blocks
        zero = self._trivial_zero_block(ct.batch_shape)
        idxs = [i for i, b in enumerate(ct.blocks) if b.degree >= m]
        msg_blocks = list(ct.blocks)
        car_blocks = [zero] * nb
        if idxs:
            lut_msg = self.key.generate_lookup_table(lambda x: x % m)
            lut_carry = self.key.generate_lookup_table(lambda x: x // m)
            ins = [ct.blocks[i] for i in idxs]
            outs = self._apply_luts_stacked(
                ins + ins, [lut_msg] * len(ins) + [lut_carry] * len(ins))
            for k, i in enumerate(idxs):
                msg_blocks[i] = outs[k]
                c = outs[len(ins) + k]
                # c.degree is lut_carry's bound; with carry_modulus > m the
                # true carry can exceed m-1, so do NOT clamp to m-1 (mirror
                # full_propagate's min(lut.degree, in.degree // m) bound)
                car_blocks[i] = c.with_(
                    degree=min(c.degree, ct.blocks[i].degree // m))
        carries = type(ct)(blocks=[zero] + car_blocks[:nb - 1])
        return type(ct)(blocks=msg_blocks), carries

    def _sum_partials(self, partials: List[RadixCiphertext]) -> RadixCiphertext:
        """Accumulate many radix ciphertexts carry-save style (reference
        unchecked_sum_ciphertexts_vec_parallelized): when the carry space is
        about to fill, split the accumulator into (message, carries) with one
        batched PBS round and re-queue the carries as another partial —
        instead of a sequential per-block carry ripple, which costs
        num_blocks dependent rounds per propagation on the batch-oriented
        TPU path.  Ends with one split + the Hillis-Steele parallel
        propagate (msg + carry degree <= 2m-2 always qualifies)."""
        if not partials:
            raise ValueError("empty sum")
        queue = list(partials)
        acc = queue.pop(0)
        while queue:
            p = queue.pop(0)
            if any(x.degree + y.degree > self.max_degree
                   for x, y in zip(acc.blocks, p.blocks)):
                acc, carries = self._split_msg_carry(acc)
                if any(b.degree for b in carries.blocks):
                    queue.append(carries)
            acc = self.unchecked_add(acc, p)
        if acc.block_carries_are_empty():
            return acc
        msg, carries = self._split_msg_carry(acc)
        acc = self.unchecked_add(msg, carries)
        return self.full_propagate_parallelized(acc)

    def sum_ciphertexts(self, cts: List[RadixCiphertext]) -> RadixCiphertext:
        """Sum many radix ciphertexts with carry-aware chunked accumulation
        (reference unchecked_sum_ciphertexts_vec_parallelized)."""
        return self._sum_partials(list(cts))

    sum_ciphertexts_parallelized = sum_ciphertexts

    def blockshift(self, a: RadixCiphertext, shift: int) -> RadixCiphertext:
        """Multiply by msg_mod^shift: move blocks up, zero-fill low blocks."""
        if shift == 0:
            return a
        zeros = [self._trivial_zero_block(a.batch_shape) for _ in range(shift)]
        return type(a)(blocks=zeros + a.blocks[:a.num_blocks - shift])

    # ------------------------------------------------------------------
    # bitwise
    # ------------------------------------------------------------------

    def _bitwise(self, a, b, op) -> RadixCiphertext:
        a, b = self._maybe_propagate(a), self._maybe_propagate(b)
        m = self.msg_mod
        lut = self.key.generate_lookup_table(lambda x: op(x // m, x % m) % m)
        pairs = [self.key.unchecked_bivariate_pack(x, y)
                 for x, y in zip(a.blocks, b.blocks)]
        return type(a)(blocks=self._apply_lut_same(pairs, lut))

    def bitand(self, a, b):
        return self._bitwise(a, b, lambda x, y: x & y)

    def bitor(self, a, b):
        return self._bitwise(a, b, lambda x, y: x | y)

    def bitxor(self, a, b):
        return self._bitwise(a, b, lambda x, y: x ^ y)

    bitand_parallelized = bitand
    bitor_parallelized = bitor
    bitxor_parallelized = bitxor

    def bitnot(self, a):
        a = self._maybe_propagate(a)
        m = self.msg_mod
        lut = self.key.generate_lookup_table(lambda x: (m - 1) - (x % m))
        return type(a)(blocks=self._apply_lut_same(a.blocks, lut))

    # ------------------------------------------------------------------
    # comparisons (lexicographic fold, reference integer/server_key/comparator.rs)
    # ------------------------------------------------------------------

    def _compare_states(self, a: RadixCiphertext, b: RadixCiphertext) -> List[Block]:
        """Per-block state ∈ {EQ, LT, GT} via one batched bivariate PBS."""
        m = self.msg_mod

        def st(x, y):
            return EQ if x == y else (LT if x < y else GT)

        lut = self.key.generate_lookup_table(lambda x: st(x // m, x % m))
        pairs = [self.key.unchecked_bivariate_pack(x, y)
                 for x, y in zip(a.blocks, b.blocks)]
        return self._apply_lut_same(pairs, lut)

    def _scalar_compare_states(self, a: RadixCiphertext, scalar: int) -> List[Block]:
        sb = self._scalar_blocks(scalar, a.num_blocks)

        def mk(s):
            return self.key.generate_lookup_table(
                lambda x, s=s: EQ if x == s else (LT if x < s else GT))

        return self._apply_luts_stacked(a.blocks, [mk(s) for s in sb])

    def _fold_states(self, states: List[Block]) -> Block:
        """Tree-fold: combined = hi if hi != EQ else lo; log₂(b) batched layers."""
        combine = self.key.generate_lookup_table(
            lambda x: (x // 4) if (x // 4) != EQ else (x % 4))
        while len(states) > 1:
            pairs, passthrough = [], []
            it = list(states)
            new_order = []
            for i in range(0, len(it) - 1, 2):
                lo, hi = it[i], it[i + 1]
                packed = hi.with_(
                    lwe=LweCiphertext(data=hi.lwe.data * jnp.uint64(4) + lo.lwe.data),
                    degree=hi.degree * 4 + lo.degree,
                    noise_level=hi.noise_level * 4 + lo.noise_level)
                pairs.append(packed)
            if len(it) % 2:
                passthrough = [it[-1]]
            states = self._apply_lut_same(pairs, combine) + passthrough
            if passthrough and len(states) > 1:
                # odd leftover is the most significant: keep it last
                pass
        return states[0]

    def _state_to_bool(self, state: Block, accept) -> BooleanBlock:
        lut = self.key.generate_lookup_table(lambda x: int(x in accept))
        return BooleanBlock(block=self.key.apply_lookup_table(state, lut))

    def _cmp(self, a, b, accept) -> BooleanBlock:
        a, b = self._maybe_propagate(a), self._maybe_propagate(b)
        states = self._compare_states(a, b)
        return self._state_to_bool(self._fold_states(states), accept)

    def eq(self, a, b):
        """Faster path: per-block equality bits, sum, compare to block count."""
        a, b = self._maybe_propagate(a), self._maybe_propagate(b)
        m = self.msg_mod
        lut = self.key.generate_lookup_table(lambda x: int((x // m) == (x % m)))
        pairs = [self.key.unchecked_bivariate_pack(x, y)
                 for x, y in zip(a.blocks, b.blocks)]
        bits = self._apply_lut_same(pairs, lut)
        return self._all_ones(bits)

    def _all_ones(self, bits: List[Block]) -> BooleanBlock:
        nb = len(bits)
        chunk = min(self.max_degree, nb)
        while len(bits) > 1:
            grouped = []
            for i in range(0, len(bits), chunk):
                group = bits[i:i + chunk]
                s = group[0]
                for g in group[1:]:
                    s = self.key.unchecked_add(s, g)
                k = len(group)
                grouped.append(self.key.evaluate_univariate(
                    s, lambda x, k=k: int(x == k)))
            bits = grouped
        return BooleanBlock(block=bits[0])

    def ne(self, a, b):
        e = self.eq(a, b)
        return BooleanBlock(block=self.key.evaluate_univariate(
            e.block, lambda x: 1 - (x % 2)))

    def lt(self, a, b):
        return self._cmp(a, b, accept=(LT,))

    def le(self, a, b):
        return self._cmp(a, b, accept=(LT, EQ))

    def gt(self, a, b):
        return self._cmp(a, b, accept=(GT,))

    def ge(self, a, b):
        return self._cmp(a, b, accept=(GT, EQ))

    eq_parallelized = eq
    ne_parallelized = ne
    lt_parallelized = lt
    le_parallelized = le
    gt_parallelized = gt
    ge_parallelized = ge

    def scalar_eq(self, a, scalar: int):
        a = self._maybe_propagate(a)
        sb = self._scalar_blocks(scalar, a.num_blocks)
        luts = [self.key.generate_lookup_table(lambda x, s=s: int(x == s))
                for s in sb]
        bits = self._apply_luts_stacked(a.blocks, luts)
        return self._all_ones(bits)

    def scalar_ne(self, a, scalar: int):
        e = self.scalar_eq(a, scalar)
        return BooleanBlock(block=self.key.evaluate_univariate(
            e.block, lambda x: 1 - (x % 2)))

    scalar_eq_parallelized = scalar_eq
    scalar_ne_parallelized = scalar_ne

    def _scalar_cmp(self, a, scalar: int, accept):
        a = self._maybe_propagate(a)
        states = self._scalar_compare_states(a, scalar)
        return self._state_to_bool(self._fold_states(states), accept)

    def scalar_lt(self, a, s):
        return self._scalar_cmp(a, s, (LT,))

    def scalar_le(self, a, s):
        return self._scalar_cmp(a, s, (LT, EQ))

    def scalar_gt(self, a, s):
        return self._scalar_cmp(a, s, (GT,))

    def scalar_ge(self, a, s):
        return self._scalar_cmp(a, s, (GT, EQ))

    # ------------------------------------------------------------------
    # selection / min / max
    # ------------------------------------------------------------------

    def cmux(self, cond: BooleanBlock, a: RadixCiphertext,
             b: RadixCiphertext) -> RadixCiphertext:
        """cond ? a : b — blockwise (a-b)*cond + b with batched bivariate PBS."""
        a, b = self._maybe_propagate(a), self._maybe_propagate(b)
        m = self.msg_mod
        # diff blocks can be negative: compute (a_i - b_i) mod m per block with
        # borrow-free trick: use bivariate LUT select instead
        lut = self.key.generate_lookup_table(
            lambda x: (x % m) if ((x // m) % 2) else 0)
        # pack cond with each of a and b: out = cond ? a_i : b_i
        sel_a, sel_b = [], []
        for x, y in zip(a.blocks, b.blocks):
            sel_a.append(self.key.unchecked_bivariate_pack(cond.block, x))
            sel_b.append(self.key.unchecked_bivariate_pack(cond.block, y))
        lut_then = self.key.generate_lookup_table(
            lambda x: (x % m) if (x // m) == 1 else 0)
        lut_else = self.key.generate_lookup_table(
            lambda x: (x % m) if (x // m) == 0 else 0)
        outs = self._apply_luts_stacked(sel_a + sel_b,
                                        [lut_then] * len(sel_a) + [lut_else] * len(sel_b))
        nb = a.num_blocks
        # the two selections are EXCLUSIVE (cond picks one, the other is 0),
        # so the value bound is max(then, else), not the sum — declaring the
        # true degree keeps carries empty and no propagation is needed
        # (the old degree-sum bookkeeping forced a full ripple propagate per
        # cmux, which dominated every barrel-shift/rotate/min/max/div layer)
        blocks = [self.key.unchecked_add(outs[i], outs[nb + i]).with_(
            degree=max(outs[i].degree, outs[nb + i].degree))
            for i in range(nb)]
        return type(a)(blocks=blocks)

    if_then_else = cmux
    if_then_else_parallelized = cmux

    def min(self, a, b):
        return self.cmux(self.le(a, b), a, b)

    def max(self, a, b):
        return self.cmux(self.ge(a, b), a, b)

    min_parallelized = min
    max_parallelized = max

    # ------------------------------------------------------------------
    # signed comparisons / abs / overflow (reference tests_signed &
    # radix_parallel overflowing ops)
    # ------------------------------------------------------------------

    def _flip_sign_bit(self, a: RadixCiphertext) -> RadixCiphertext:
        """XOR the two's-complement sign bit (top bit of the top block):
        maps signed order onto unsigned order."""
        a = self._maybe_propagate(a)
        m = self.msg_mod
        lut = self.key.generate_lookup_table(lambda x: (x % m) ^ (m // 2))
        top = self.key.apply_lookup_table(a.blocks[-1], lut)
        return type(a)(blocks=a.blocks[:-1] + [top])

    def _signed_cmp(self, fn, a, b):
        return fn(self._flip_sign_bit(a), self._flip_sign_bit(b))

    def lt_signed(self, a, b):
        return self._signed_cmp(self.lt, a, b)

    def le_signed(self, a, b):
        return self._signed_cmp(self.le, a, b)

    def gt_signed(self, a, b):
        return self._signed_cmp(self.gt, a, b)

    def ge_signed(self, a, b):
        return self._signed_cmp(self.ge, a, b)

    def min_signed(self, a, b):
        return self.cmux(self.le_signed(a, b), a, b)

    def max_signed(self, a, b):
        return self.cmux(self.ge_signed(a, b), a, b)

    def abs_signed(self, a: RadixCiphertext) -> RadixCiphertext:
        """|a| for two's complement (reference abs_parallelized)."""
        zero = self.create_trivial_zero_radix(a.num_blocks, a.batch_shape)
        neg = self.neg(a)
        is_neg = self.lt_signed(a, zero)
        return self.cmux(is_neg, neg, a)

    abs_parallelized = abs_signed

    def unsigned_overflowing_add(self, a: RadixCiphertext, b: RadixCiphertext):
        """(sum mod 2^bits, overflow BooleanBlock) — reference
        unsigned_overflowing_add_parallelized."""
        a, b = self._maybe_propagate(a), self._maybe_propagate(b)
        s = self.unchecked_add(a, b)
        m = self.msg_mod
        lut_msg = self.key.generate_lookup_table(lambda x: x % m)
        lut_carry = self.key.generate_lookup_table(lambda x: x // m)
        out, carry = [], None
        for blk in s.blocks:
            if carry is not None:
                blk = self.key.unchecked_add(blk, carry)
            msg, carry = self._apply_luts_stacked([blk, blk], [lut_msg, lut_carry])
            carry = carry.with_(degree=1)
            out.append(msg)
        return type(a)(blocks=out), BooleanBlock(block=carry)

    def unsigned_overflowing_sub(self, a: RadixCiphertext, b: RadixCiphertext):
        """(a - b mod 2^bits, borrow flag: 1 when a < b)."""
        diff = self.sub(a, b)
        return diff, self.lt(a, b)

    # ------------------------------------------------------------------
    # shifts by an encrypted amount (reference radix_parallel shift.rs):
    # a mux ladder over the amount's bits
    # ------------------------------------------------------------------

    def _amount_bits(self, amount: RadixCiphertext, n_needed: int):
        bits_pb = int(math.log2(self.msg_mod))
        amount = self._maybe_propagate(amount)
        luts = []
        for i in range(n_needed):
            blk = i // bits_pb
            bit = i % bits_pb
            luts.append((blk, self.key.generate_lookup_table(
                lambda x, b=bit: (x >> b) & 1)))
        blocks = [amount.blocks[blk] if blk < amount.num_blocks else None
                  for blk, _ in luts]
        # one stacked PBS for every selector bit (was one call per bit)
        live = [(i, b, lut) for i, ((blk, lut), b)
                in enumerate(zip(luts, blocks)) if b is not None]
        outs = [None] * len(luts)
        if live:
            res = self._apply_luts_stacked([b for _, b, _ in live],
                                           [lut for _, _, lut in live])
            for (i, _, _), r in zip(live, res):
                outs[i] = r
        return outs

    def _sub_bit_variants(self, a: RadixCiphertext, subs, kind: str):
        """`a` shifted/rotated by `sub` BITS (0 < sub < bits_per_block) for
        every sub in `subs`, all in ONE stacked PBS round: the packed
        (neighbour, current) pairs are identical across subs — only the LUT
        differs — so the batch is len(subs) * num_blocks."""
        m = self.msg_mod
        bits = int(math.log2(m))
        nb = a.num_blocks
        zero = self._trivial_zero_block(a.batch_shape)
        left = kind in ("shl", "rotl")
        wrap = kind in ("rotl", "rotr")
        pairs = []
        for i in range(nb):
            if left:
                nbr = a.blocks[(i - 1) % nb] if (wrap or i > 0) else zero
            else:
                nbr = a.blocks[(i + 1) % nb] if (wrap or i + 1 < nb) else zero
            pairs.append(self.key.unchecked_bivariate_pack(nbr, a.blocks[i]))
        luts = []
        for sub in subs:
            if left:
                f = lambda x, s=sub: ((((x % m) << s) | ((x // m) >> (bits - s))) % m)
            else:
                f = lambda x, s=sub: (((x % m) >> s) | (((x // m) << (bits - s)) % m))
            luts.append(self.key.generate_lookup_table(f))
        flat = self._apply_luts_stacked(pairs * len(subs),
                                        [l for l in luts for _ in range(nb)])
        return {sub: type(a)(blocks=flat[k * nb:(k + 1) * nb])
                for k, sub in enumerate(subs)}

    def _block_reindex(self, a: RadixCiphertext, nblk: int, kind: str):
        """Shift/rotate by `nblk` whole BLOCKS — free (no PBS)."""
        if nblk == 0:
            return a
        nb = a.num_blocks
        zero = self._trivial_zero_block(a.batch_shape)
        if kind == "shl":
            blocks = ([zero] * min(nblk, nb) + a.blocks[:max(nb - nblk, 0)])[:nb]
        elif kind == "shr":
            blocks = a.blocks[nblk:] + [zero] * min(nblk, nb)
            blocks = blocks[:nb]
        elif kind == "rotl":
            blocks = [a.blocks[(i - nblk) % nb] for i in range(nb)]
        else:  # rotr
            blocks = [a.blocks[(i + nblk) % nb] for i in range(nb)]
        return type(a)(blocks=blocks)

    def _shift_rotate_by_encrypted(self, a: RadixCiphertext,
                                   amount: RadixCiphertext,
                                   kind: str) -> RadixCiphertext:
        """Shift/rotate by an encrypted amount via layered exclusive
        selection (reference: a cmux barrel over the amount's bits,
        integer/server_key/radix_parallel/{shift,rotate}.rs — redesigned
        for batched TPU PBS).

        The amount's radix blocks ARE the selectors: layer g picks among the
        2^bits_per_block candidate shifts {s << (g*bp)} by summing one
        bivariate-packed LUT per DISTINCT candidate per block.  Block-granular
        candidates are free reindexings; only layer 0's sub-block-bit bases
        cost a (single, stacked) LUT pass.  The selections are exclusive, so
        the sum's degree is the max, not the sum (no carry propagation), and
        no selector-bit extraction PBS is needed — the LUT masks irrelevant
        high bits of the selector block itself.

        uint32 @ 2_2: 176 PBS in 4 stacked rounds of [16, 64, 64, 32]
        (the old per-bit cmux barrel: 181 PBS across ~7 small rounds).
        Noise bookkeeping (exact): a layer's output is a sum of 2^bp
        exclusive terms, Var = 2^bp x Var_fresh; the NEXT layer's packed
        input sel*m + cand then has norm2^2 = m^2 + 2^bp = 20 at 2_2,
        vs the fresh-operand pack's m^2 + 1 = 17 — sigma grows by
        sqrt(20/17) ~ +8%, i.e. noise_level 8 > MaxNoiseLevel 5 on the
        tracked (conservative, linear) bound.  The p_fail guarantee here
        rests on the measured PBS-output-noise gate (test_noise_
        distribution.py measures sigma_out directly, with >3 bits of
        margin at 2_2) and the on-chip p_fail sampling run (PFAIL.json,
        0/102400), not on the linear bound — if parameters with tighter
        margin are ever added, refresh (message_extract) the layer-2+
        candidates before packing.
        """
        from .shift_key import _shift_rotate_ggsw, ggsw_shift_supported
        m = self.msg_mod
        bp = int(math.log2(m))
        nb_ = a.num_blocks
        if ggsw_shift_supported(self.shift_key, m, nb_, amount.num_blocks):
            total = nb_ * bp
            pow2_total = total & (total - 1) == 0
            # rotates need an exact power-of-two width for the doubled-copy
            # window (shifts past the width naturally produce zeros instead)
            if kind in ("shl", "shr") or pow2_total:
                return _shift_rotate_ggsw(self, a, amount, kind)
        a = self._maybe_propagate(a)
        amount = self._maybe_propagate(amount)
        nb = a.num_blocks
        total_bits = nb * bp
        n_sel = max(1, int(math.ceil(math.log2(total_bits))))
        # selector-bit groups: (amount block, bit offset in block, width<=2)
        groups = []
        lo_bit = 0
        while lo_bit < n_sel:
            g, o = divmod(lo_bit, bp)
            if g >= amount.num_blocks:
                break               # missing high amount blocks are zero
            w = min(2, bp - o, n_sel - lo_bit)
            groups.append((g, o, w, lo_bit))
            lo_bit += w
        # a non-initial group needing sub-bit candidate bases would stack
        # noise (sum-of-2^w candidates packed as the LUT neighbour input);
        # only non-power-of-two bp (3_3) hits this — legacy barrel there
        for idx, (g, o, w, lo) in enumerate(groups):
            shifts = {((s >> o) & ((1 << w) - 1)) << lo for s in range(m)}
            if idx > 0 and any(sh % bp for sh in shifts):
                return self._shift_rotate_barrel(a, amount, kind)
        out = a
        for g, o, w, lo in groups:
            relmask = (1 << w) - 1
            sel = amount.blocks[g]
            cand_shifts = sorted({((s >> o) & relmask) << lo
                                  for s in range(m)})
            if cand_shifts == [0]:
                continue
            # candidates: sub-bit bases in one stacked round, block
            # reindexings free
            subs = sorted({sh % bp for sh in cand_shifts} - {0})
            bases = self._sub_bit_variants(out, subs, kind) if subs else {}
            bases[0] = out
            cands = {sh: self._block_reindex(bases[sh % bp], sh // bp, kind)
                     for sh in cand_shifts}
            # exclusive selection: one LUT per distinct candidate, all blocks
            # of all candidates in one stacked round.  A candidate block that
            # is a trivial zero (degree 0 — shifts fill vacated blocks with
            # trivial zeros) contributes [sel=k]*0 = 0, so its term needs no
            # PBS at all: uint32 shl drops from 176 to 154 PBS this way.
            packed, luts, slots = [], [], []
            for sh in cand_shifts:
                lut = self.key.generate_lookup_table(
                    lambda x, sh=sh, o=o, lo=lo, rm=relmask: (x % m) if (
                        (((x // m) >> o) & rm) << lo) == sh else 0)
                for j in range(nb):
                    blkj = cands[sh].blocks[j]
                    if blkj.degree == 0:
                        continue
                    packed.append(self.key.unchecked_bivariate_pack(sel, blkj))
                    luts.append(lut)
                    slots.append((sh, j))
            outs = self._apply_luts_stacked(packed, luts) if packed else []
            by_block = {}
            for (sh, j), t in zip(slots, outs):
                by_block.setdefault(j, []).append(t)
            blocks = []
            for j in range(nb):
                terms = by_block.get(j)
                if not terms:
                    blocks.append(self._trivial_zero_block(a.batch_shape))
                    continue
                acc = terms[0]
                for t in terms[1:]:
                    acc = self.key.unchecked_add(acc, t)
                blocks.append(acc.with_(degree=max(t.degree for t in terms)))
            out = type(a)(blocks=blocks)
        return out

    def _shift_rotate_barrel(self, a, amount, kind: str):
        """Legacy per-bit cmux barrel (used when bits_per_block is not a
        power of two, where the layered path's later groups would need
        sub-bit bases built from noisy candidate sums)."""
        scalar_op = {"shl": self.scalar_left_shift,
                     "shr": self.scalar_right_shift,
                     "rotl": self.scalar_rotate_left,
                     "rotr": self.scalar_rotate_right}[kind]
        total_bits = a.num_blocks * int(math.log2(self.msg_mod))
        n_sel = max(1, int(math.ceil(math.log2(total_bits))))
        bits = self._amount_bits(amount, n_sel)
        out = self._maybe_propagate(a)
        for i, bit in enumerate(bits):
            if bit is None:
                continue
            moved = scalar_op(out, 1 << i)
            out = self.cmux(BooleanBlock(block=bit), moved, out)
        return out

    def left_shift(self, a: RadixCiphertext, amount: RadixCiphertext) -> RadixCiphertext:
        return self._shift_rotate_by_encrypted(a, amount, "shl")

    def right_shift(self, a: RadixCiphertext, amount: RadixCiphertext) -> RadixCiphertext:
        return self._shift_rotate_by_encrypted(a, amount, "shr")

    left_shift_parallelized = left_shift
    right_shift_parallelized = right_shift

    # ------------------------------------------------------------------
    # division (restoring long division, reference radix_parallel div_mod)
    # ------------------------------------------------------------------

    def _extract_bits(self, a: RadixCiphertext):
        """All bits of `a`, LSB first, as degree-1 blocks — one batched PBS
        per bit position within a block (bits_per_block LUT sweeps)."""
        a = self._maybe_propagate(a)
        bits_pb = int(math.log2(self.msg_mod))
        out = []
        for bit in range(bits_pb):
            lut = self.key.generate_lookup_table(lambda x, b=bit: (x >> b) & 1)
            out.append(self._apply_lut_same(a.blocks, lut))
        # interleave: bit index i of the value = out[i % bits_pb][i // bits_pb]
        total = a.num_blocks * bits_pb
        return [out[i % bits_pb][i // bits_pb] for i in range(total)]

    def div_rem(self, a: RadixCiphertext, b: RadixCiphertext):
        """(quotient, remainder); dispatches signed operands to the
        sign-corrected divider like the reference's generic
        div_rem_parallelized (div_mod.rs:597).  x/0 follows the reference
        convention on BOTH paths: quotient all-ones, remainder x (the
        unrolled path's ge(rem, 0) is vacuously true; the scan path
        restores it with an explicit b==0 cmux)."""
        if isinstance(a, SignedRadixCiphertext):
            return self.signed_div_rem(a, b)
        a, b = self._maybe_propagate(a), self._maybe_propagate(b)
        nb = a.num_blocks
        bits_pb = int(math.log2(self.msg_mod))
        total_bits = nb * bits_pb
        if total_bits >= 8:
            # the fully unrolled restoring loop emits one program copy per
            # round (10.5 MB of MLIR at 32 bits — breaks the remote AOT
            # compile helper), and the scan round's carry-out trick beats
            # the unrolled ge+sub+cmux round ~2x in PBS count anyway; only
            # tiny (test-set) widths keep the unrolled form
            return self._div_rem_scan(a, b)
        bits = self._extract_bits(a)              # LSB first

        rem = self.create_trivial_zero_radix(nb, a.batch_shape)
        q_bits = [None] * total_bits
        for i in range(total_bits - 1, -1, -1):
            # rem = (rem << 1) | bit_i
            rem = self.scalar_left_shift(rem, 1)
            rem = type(rem)(blocks=[self.key.unchecked_add(rem.blocks[0], bits[i])]
                            + rem.blocks[1:])
            rem = self._maybe_propagate(rem)
            ge = self.ge(rem, b)
            rem_minus = self.sub(rem, b)
            rem = self.cmux(ge, rem_minus, rem)
            q_bits[i] = ge.block
        # assemble quotient from bits
        q_blocks = []
        for blk in range(nb):
            acc = None
            for j in range(bits_pb):
                bit_blk = q_bits[blk * bits_pb + j]
                term = (self.key.unchecked_scalar_mul(bit_blk, 1 << j)
                        if j else bit_blk)
                acc = term if acc is None else self.key.unchecked_add(acc, term)
            q_blocks.append(acc)
        quotient = self.full_propagate(RadixCiphertext(blocks=q_blocks))
        return quotient, rem

    def _div_rem_scan(self, a: RadixCiphertext, b: RadixCiphertext):
        """Restoring long division with the round body under `lax.scan`:
        every round runs the SAME compiled program (shift-in-bit LUT sweep,
        ge tree, subtract+propagate, exclusive-selection cmux), so the XLA
        program holds ONE round instead of total_bits unrolled copies.

        Correctness of the uniform round: entry invariant is rem blocks at
        degree <= m-1 and PBS-fresh; the round's exit degrees are <= the
        entry bound by construction (shift LUT outputs m-1, propagate
        outputs <= m-1, cmux takes the max), so relabelling the scan carry
        at the bound is sound.  Degree labels only ever widen, never
        narrow, which can add no incorrect LUT short-cuts."""
        import jax
        m = self.msg_mod
        carry_mod = self.key.carry_modulus
        nb = a.num_blocks
        bits_pb = int(math.log2(m))
        total_bits = nb * bits_pb
        bits = self._extract_bits(a)              # LSB first, degree 1
        negb = self.neg(b)                        # loop-invariant two's compl.
        negb_deg = [bl.degree for bl in negb.blocks]
        negb_data = [bl.lwe.data for bl in negb.blocks]

        def mk_block(data, degree):
            return Block(lwe=LweCiphertext(data=data), degree=degree,
                         message_modulus=m, carry_modulus=carry_mod,
                         noise_level=NoiseLevel.NOMINAL)

        lut_b0 = self.key.generate_lookup_table(lambda x: x % m)
        lut_bi = self.key.generate_lookup_table(
            lambda x: (((x // m) << 1) | ((x % m) >> (bits_pb - 1))) % m)

        def round_fn(rem_data, bit_data):
            rem = [mk_block(rem_data[i], m - 1) for i in range(nb)]
            bit = mk_block(bit_data, 1)
            # rem' = (rem << 1) | bit — one bivariate LUT per block
            packed = [self.key.unchecked_bivariate_pack_with_factor(
                rem[0], bit, 2)]
            for i in range(1, nb):
                packed.append(self.key.unchecked_bivariate_pack(rem[i],
                                                                rem[i - 1]))
            shifted = self._apply_luts_stacked(
                packed, [lut_b0] + [lut_bi] * (nb - 1))
            srad = RadixCiphertext(blocks=shifted)
            # the trial subtraction's CARRY OUT is the >= test: rem + (2^w -
            # b) overflows 2^w exactly when rem >= b — one overflowing-add
            # ripple (2 LUTs per block) replaces the separate comparison
            # tree AND the subtract-propagate (~170 -> ~80 PBS per round)
            negb_ct = RadixCiphertext(blocks=[
                mk_block(d, dg) for d, dg in zip(negb_data, negb_deg)])
            trial, ge = self.unsigned_overflowing_add(srad, negb_ct)
            new_rem = self.cmux(ge, trial, srad)
            new_data = jnp.stack([bl.lwe.data for bl in new_rem.blocks])
            return new_data, ge.block.lwe.data

        rem0 = jnp.stack([a.blocks[0].lwe.data * jnp.uint64(0)] * nb)
        bits_rev = jnp.stack(
            [bits[i].lwe.data for i in reversed(range(total_bits))])
        final_rem, ge_rev = jax.lax.scan(round_fn, rem0, bits_rev)

        q_bits = [mk_block(ge_rev[total_bits - 1 - i], 1)
                  for i in range(total_bits)]
        q_blocks = []
        for blk in range(nb):
            acc = None
            for j in range(bits_pb):
                t = q_bits[blk * bits_pb + j]
                term = self.key.unchecked_scalar_mul(t, 1 << j) if j else t
                acc = term if acc is None else self.key.unchecked_add(acc, term)
            q_blocks.append(acc)
        quotient = self.full_propagate(RadixCiphertext(blocks=q_blocks))
        # x/0: the carry-out trick reads false for b=0 (rem + neg(0) never
        # overflows), which would yield quotient 0 — the reference convention
        # (sub never underflows, all quotient bits set) is restored with one
        # loop-invariant b==0 test and a cmux to the all-ones value; the
        # remainder is already a (no subtraction ever fires)
        b_is_zero = self.scalar_eq(b, 0)
        all_ones = self.create_trivial_radix((1 << total_bits) - 1, nb,
                                             a.batch_shape)
        quotient = self.cmux(b_is_zero, all_ones, quotient)
        rem = RadixCiphertext(blocks=[mk_block(final_rem[i], m - 1)
                                      for i in range(nb)])
        return quotient, rem

    def div(self, a, b):
        return self.div_rem(a, b)[0]

    def rem(self, a, b):
        return self.div_rem(a, b)[1]

    div_parallelized = div
    rem_parallelized = rem
    div_rem_parallelized = div_rem

    # ------------------------------------------------------------------
    # signed encrypted division
    # ------------------------------------------------------------------

    def _pack2_bool(self, x: Block, y: Block, f) -> Block:
        """LUT over two degree-1 blocks packed as 2x+y (needs
        max_degree ≥ 3, true for every parameter set with carries)."""
        packed = x.with_(
            lwe=LweCiphertext(data=x.lwe.data * jnp.uint64(2) + y.lwe.data),
            degree=2 * x.degree + y.degree,
            noise_level=2 * x.noise_level + y.noise_level)
        lut = self.key.generate_lookup_table(
            lambda v: int(f((v >> 1) & 1, v & 1)))
        return self.key.apply_lookup_table(packed, lut)

    def signed_div_rem(self, a: SignedRadixCiphertext,
                       b: SignedRadixCiphertext):
        """Truncating division of two encrypted signed radix values: |a|/|b|
        through the unsigned restoring divider, then sign fix-up — the
        quotient is negated iff the operand signs differ, the remainder
        takes the numerator's sign (reference
        signed_unchecked_div_rem_parallelized,
        integer/server_key/radix_parallel/div_mod.rs:494-560)."""
        a, b = self._maybe_propagate(a), self._maybe_propagate(b)
        sa, sb = self._sign_bit(a), self._sign_bit(b)
        abs_a = RadixCiphertext(blocks=self.cmux(sa, self.neg(a), a).blocks)
        abs_b = RadixCiphertext(blocks=self.cmux(sb, self.neg(b), b).blocks)
        q_u, r_u = self.div_rem(abs_a, abs_b)
        differ = BooleanBlock(block=self._pack2_bool(
            sa.block, sb.block, lambda x, y: x != y))
        q = self.cmux(differ, self.neg(q_u), q_u)
        r = self.cmux(sa, self.neg(r_u), r_u)
        return (SignedRadixCiphertext(blocks=q.blocks),
                SignedRadixCiphertext(blocks=r.blocks))

    def signed_div(self, a, b):
        return self.signed_div_rem(a, b)[0]

    def signed_rem(self, a, b):
        return self.signed_div_rem(a, b)[1]

    def signed_div_rem_floor(self, a: SignedRadixCiphertext,
                             b: SignedRadixCiphertext):
        """Floor division: q_f = q_t − 1 and r_f = r_t + b exactly when the
        truncating remainder is non-zero and the operand signs differ
        (reference unchecked_div_rem_floor_parallelized,
        integer/server_key/radix_parallel/div_mod.rs)."""
        a, b = self._maybe_propagate(a), self._maybe_propagate(b)
        q, r = self.signed_div_rem(a, b)
        sa, sb = self._sign_bit(a), self._sign_bit(b)
        differ = self._pack2_bool(sa.block, sb.block, lambda x, y: x != y)
        zero = self.create_trivial_zero_radix(r.num_blocks, r.batch_shape)
        nonzero = self.ne(RadixCiphertext(blocks=r.blocks), zero)
        adjust = BooleanBlock(block=self._pack2_bool(
            differ, nonzero.block, lambda x, y: bool(x) and bool(y)))
        q_f = self.cmux(adjust, self.scalar_sub(q, 1), q)
        r_f = self.cmux(adjust, self.add(r, b), r)
        return q_f, r_f

    div_rem_floor = signed_div_rem_floor
    unchecked_div_rem_floor_parallelized = signed_div_rem_floor

    # ------------------------------------------------------------------
    # shifts by a clear amount
    # ------------------------------------------------------------------

    def scalar_left_shift(self, a: RadixCiphertext, shift: int) -> RadixCiphertext:
        a = self._maybe_propagate(a)
        bits = int(math.log2(self.msg_mod))
        blk, sub = divmod(shift, bits)
        a = self.blockshift(a, blk)
        if sub == 0:
            return a
        m = self.msg_mod
        # block_i' = ((a_i << sub) | (a_{i-1} >> (bits-sub))) % m
        lut = self.key.generate_lookup_table(
            lambda x: (((x % m) << sub) | ((x // m) >> (bits - sub))) % m)
        pairs = []
        zero = self._trivial_zero_block(a.batch_shape)
        for i in range(a.num_blocks):
            prev = a.blocks[i - 1] if i > 0 else zero
            pairs.append(self.key.unchecked_bivariate_pack(prev, a.blocks[i]))
        return type(a)(blocks=self._apply_lut_same(pairs, lut))

    scalar_left_shift_parallelized = scalar_left_shift

    def scalar_right_shift(self, a: RadixCiphertext, shift: int) -> RadixCiphertext:
        a = self._maybe_propagate(a)
        bits = int(math.log2(self.msg_mod))
        blk, sub = divmod(shift, bits)
        nb = a.num_blocks
        zero = self._trivial_zero_block(a.batch_shape)
        blocks = a.blocks[blk:] + [zero] * min(blk, nb)
        a = type(a)(blocks=blocks[:nb])
        if sub == 0:
            return a
        m = self.msg_mod
        lut = self.key.generate_lookup_table(
            lambda x: (((x % m) >> sub) | (((x // m) << (bits - sub)) % m)))
        pairs = []
        for i in range(nb):
            nxt = a.blocks[i + 1] if i + 1 < nb else zero
            pairs.append(self.key.unchecked_bivariate_pack(nxt, a.blocks[i]))
        return type(a)(blocks=self._apply_lut_same(pairs, lut))

    scalar_right_shift_parallelized = scalar_right_shift

    # ------------------------------------------------------------------
    # bit rotations (reference radix_parallel rotate_left/right and the
    # scalar_rotate variants, integer/server_key/radix_parallel/rotate.rs) —
    # the shift machinery with wraparound blocks instead of zeros
    # ------------------------------------------------------------------

    def scalar_rotate_left(self, a: RadixCiphertext, r: int) -> RadixCiphertext:
        a = self._maybe_propagate(a)
        bits = int(math.log2(self.msg_mod))
        nb = a.num_blocks
        r %= nb * bits
        if r == 0:
            return a
        blk, sub = divmod(r, bits)
        a = type(a)(blocks=[a.blocks[(i - blk) % nb] for i in range(nb)])
        if sub == 0:
            return a
        m = self.msg_mod
        lut = self.key.generate_lookup_table(
            lambda x: (((x % m) << sub) | ((x // m) >> (bits - sub))) % m)
        pairs = [self.key.unchecked_bivariate_pack(a.blocks[(i - 1) % nb],
                                                   a.blocks[i])
                 for i in range(nb)]
        return type(a)(blocks=self._apply_lut_same(pairs, lut))

    scalar_rotate_left_parallelized = scalar_rotate_left

    def scalar_rotate_right(self, a: RadixCiphertext, r: int) -> RadixCiphertext:
        a = self._maybe_propagate(a)
        bits = int(math.log2(self.msg_mod))
        nb = a.num_blocks
        r %= nb * bits
        if r == 0:
            return a
        blk, sub = divmod(r, bits)
        a = type(a)(blocks=[a.blocks[(i + blk) % nb] for i in range(nb)])
        if sub == 0:
            return a
        m = self.msg_mod
        lut = self.key.generate_lookup_table(
            lambda x: (((x % m) >> sub) | (((x // m) << (bits - sub)) % m)))
        pairs = [self.key.unchecked_bivariate_pack(a.blocks[(i + 1) % nb],
                                                   a.blocks[i])
                 for i in range(nb)]
        return type(a)(blocks=self._apply_lut_same(pairs, lut))

    scalar_rotate_right_parallelized = scalar_rotate_right

    def rotate_left(self, a: RadixCiphertext, amount: RadixCiphertext) -> RadixCiphertext:
        """Rotation by an encrypted amount, taken mod 2^ceil(log2(total_bits))
        (= mod total_bits whenever the bit width is a power of two, as for
        every FheUint type)."""
        return self._shift_rotate_by_encrypted(a, amount, "rotl")

    def rotate_right(self, a: RadixCiphertext, amount: RadixCiphertext) -> RadixCiphertext:
        return self._shift_rotate_by_encrypted(a, amount, "rotr")

    rotate_left_parallelized = rotate_left
    rotate_right_parallelized = rotate_right

    # ------------------------------------------------------------------
    # width casts (reference cast_to_unsigned / extend/trim)
    # ------------------------------------------------------------------

    def cast_to_size(self, a: RadixCiphertext, nb: int) -> RadixCiphertext:
        a = self._maybe_propagate(a)
        if nb <= a.num_blocks:
            return type(a)(blocks=a.blocks[:nb])
        zero = self._trivial_zero_block(a.batch_shape)
        return type(a)(blocks=a.blocks + [zero] * (nb - a.num_blocks))

    # ------------------------------------------------------------------
    # scalar bitwise (reference radix_parallel/scalar_bitwise_op.rs):
    # one batched LUT layer with the scalar's radix digits baked in
    # ------------------------------------------------------------------

    def _scalar_bitwise(self, a: RadixCiphertext, scalar: int, op) -> RadixCiphertext:
        a = self._maybe_propagate(a)
        m = self.msg_mod
        sb = self._scalar_blocks(scalar, a.num_blocks)
        luts = [self.key.generate_lookup_table(
                    lambda x, s=s: op(x % m, s) % m) for s in sb]
        return type(a)(blocks=self._apply_luts_stacked(a.blocks, luts))

    def scalar_bitand(self, a, scalar: int):
        return self._scalar_bitwise(a, scalar, lambda x, s: x & s)

    def scalar_bitor(self, a, scalar: int):
        return self._scalar_bitwise(a, scalar, lambda x, s: x | s)

    def scalar_bitxor(self, a, scalar: int):
        return self._scalar_bitwise(a, scalar, lambda x, s: x ^ s)

    scalar_bitand_parallelized = scalar_bitand
    scalar_bitor_parallelized = scalar_bitor
    scalar_bitxor_parallelized = scalar_bitxor

    # ------------------------------------------------------------------
    # scalar min/max and small-scalar / single-block multiplies
    # ------------------------------------------------------------------

    def scalar_min(self, a: RadixCiphertext, scalar: int) -> RadixCiphertext:
        triv = self.create_trivial_radix(scalar, a.num_blocks, a.batch_shape)
        return self.cmux(self.scalar_le(a, scalar), a, triv)

    def scalar_max(self, a: RadixCiphertext, scalar: int) -> RadixCiphertext:
        triv = self.create_trivial_radix(scalar, a.num_blocks, a.batch_shape)
        return self.cmux(self.scalar_ge(a, scalar), a, triv)

    scalar_min_parallelized = scalar_min
    scalar_max_parallelized = scalar_max

    def small_scalar_mul(self, a: RadixCiphertext, scalar: int) -> RadixCiphertext:
        """scalar < msg_mod: one linear blockwise multiply + propagation
        (reference small_scalar_mul_parallelized)."""
        if not 0 <= scalar < self.msg_mod:
            raise ValueError("small_scalar_mul needs 0 <= scalar < msg_mod")
        if scalar == 0:
            return self.create_trivial_zero_radix(a.num_blocks, a.batch_shape)
        a = self._maybe_propagate(a)
        blocks = [self.key.unchecked_scalar_mul(b, scalar) for b in a.blocks]
        return self.full_propagate(type(a)(blocks=blocks))

    small_scalar_mul_parallelized = small_scalar_mul

    def block_mul(self, a: RadixCiphertext, b: Block, index: int = 0) -> RadixCiphertext:
        """Multiply a radix ciphertext by one shortint block placed at
        `index` (reference block_mul_parallelized): all lsb/msb partial
        products in one batched bivariate PBS."""
        a = self._maybe_propagate(a)
        if b.degree >= self.msg_mod:
            b = self.key.message_extract(b)
        nb = a.num_blocks
        m = self.msg_mod
        lut_lsb = self.key.generate_lookup_table(lambda x: ((x // m) * (x % m)) % m)
        lut_msb = self.key.generate_lookup_table(lambda x: ((x // m) * (x % m)) // m)
        pairs, luts, places = [], [], []
        for i in range(nb):
            if i + index < nb:
                pairs.append(self.key.unchecked_bivariate_pack(a.blocks[i], b))
                luts.append(lut_lsb)
                places.append(i + index)
            if i + index + 1 < nb:
                pairs.append(self.key.unchecked_bivariate_pack(a.blocks[i], b))
                luts.append(lut_msb)
                places.append(i + index + 1)
        outs = self._apply_luts_stacked(pairs, luts)
        lo = [self._trivial_zero_block(a.batch_shape) for _ in range(nb)]
        hi = [self._trivial_zero_block(a.batch_shape) for _ in range(nb)]
        for blk, pl in zip(outs, places):
            tgt = lo if lo[pl].degree == 0 else hi
            tgt[pl] = blk if tgt[pl].degree == 0 else self.key.unchecked_add(tgt[pl], blk)
        return self._sum_partials([type(a)(blocks=lo), type(a)(blocks=hi)])

    block_mul_parallelized = block_mul

    # ------------------------------------------------------------------
    # scalar division (reference radix_parallel/scalar_div_mod.rs):
    # Granlund–Montgomery round-up multiply-high — exact for every input
    # ------------------------------------------------------------------

    def scalar_div_rem(self, a: RadixCiphertext, divisor: int):
        q = self.scalar_div(a, divisor)
        qd = self.scalar_mul(q, divisor)
        return q, self.sub(a, qd)

    def scalar_div(self, a: RadixCiphertext, divisor: int) -> RadixCiphertext:
        if divisor <= 0:
            raise ValueError("scalar_div needs a positive divisor")
        nb = a.num_blocks
        bits = int(math.log2(self.msg_mod))
        w = nb * bits
        if divisor == 1:
            return self._maybe_propagate(a)
        if divisor >= (1 << w):
            return self.create_trivial_zero_radix(nb, a.batch_shape)
        if divisor & (divisor - 1) == 0:
            return self.scalar_right_shift(a, divisor.bit_length() - 1)
        # m·d ∈ (2^(w+sh), 2^(w+sh) + 2^sh] ⇒ floor(m·x / 2^(w+sh)) = x//d
        sh = (divisor - 1).bit_length()
        mul = (1 << (w + sh)) // divisor + 1
        # x·m < 2^(w + bits(m)) — size the wide radix to hold the full product
        nb_wide = nb + -(-mul.bit_length() // bits)
        wide = self.cast_to_size(a, nb_wide)
        prod = self.scalar_mul(wide, mul)
        shifted = self.scalar_right_shift(prod, w + sh)
        return self.cast_to_size(shifted, nb)

    def scalar_rem(self, a: RadixCiphertext, divisor: int) -> RadixCiphertext:
        return self.scalar_div_rem(a, divisor)[1]

    scalar_div_parallelized = scalar_div
    scalar_rem_parallelized = scalar_rem
    scalar_div_rem_parallelized = scalar_div_rem

    # ------------------------------------------------------------------
    # signed scalar comparisons / division (reference signed_scalar_*):
    # map two's complement onto unsigned order by offsetting 2^(w-1)
    # ------------------------------------------------------------------

    def _signed_scalar_offset(self, scalar: int, w: int) -> int:
        return (scalar + (1 << (w - 1))) % (1 << w)

    def _scalar_cmp_signed(self, a, scalar: int, accept):
        w = a.num_blocks * int(math.log2(self.msg_mod))
        return self._scalar_cmp(self._flip_sign_bit(a),
                                self._signed_scalar_offset(scalar, w), accept)

    def scalar_lt_signed(self, a, s):
        return self._scalar_cmp_signed(a, s, (LT,))

    def scalar_le_signed(self, a, s):
        return self._scalar_cmp_signed(a, s, (LT, EQ))

    def scalar_gt_signed(self, a, s):
        return self._scalar_cmp_signed(a, s, (GT,))

    def scalar_ge_signed(self, a, s):
        return self._scalar_cmp_signed(a, s, (GT, EQ))

    def _sign_bit(self, a: RadixCiphertext) -> BooleanBlock:
        a = self._maybe_propagate(a)
        bits = int(math.log2(self.msg_mod))
        lut = self.key.generate_lookup_table(
            lambda x: (x >> (bits - 1)) & 1)
        return BooleanBlock(block=self.key.apply_lookup_table(a.blocks[-1], lut))

    def signed_scalar_div_rem(self, a: RadixCiphertext, divisor: int):
        """Truncating division of a signed radix by a clear divisor
        (reference signed_scalar_div_rem_parallelized)."""
        if divisor == 0:
            raise ZeroDivisionError("signed_scalar_div by zero")
        neg_in = self._sign_bit(a)
        abs_a = self.cmux(neg_in, self.neg(a), a)
        q_u = self.scalar_div(abs_a, abs(divisor))
        r_u = self.sub(abs_a, self.scalar_mul(q_u, abs(divisor)))
        flip_q = divisor < 0
        q = self.cmux(neg_in, self.neg(q_u) if not flip_q else q_u,
                      q_u if not flip_q else self.neg(q_u))
        r = self.cmux(neg_in, self.neg(r_u), r_u)
        return type(a)(blocks=q.blocks), type(a)(blocks=r.blocks)

    def signed_scalar_div(self, a, divisor: int):
        return self.signed_scalar_div_rem(a, divisor)[0]

    def signed_scalar_rem(self, a, divisor: int):
        return self.signed_scalar_div_rem(a, divisor)[1]

    signed_scalar_div_parallelized = signed_scalar_div
    signed_scalar_rem_parallelized = signed_scalar_rem
    signed_scalar_div_rem_parallelized = signed_scalar_div_rem

    # ------------------------------------------------------------------
    # arithmetic right shift (reference
    # unchecked_scalar_right_shift_arithmetic_parallelized): logical shift,
    # then OR the sign-extension mask under a cmux on the sign bit
    # ------------------------------------------------------------------

    def scalar_right_shift_arithmetic(self, a: RadixCiphertext,
                                      shift: int) -> RadixCiphertext:
        w = a.num_blocks * int(math.log2(self.msg_mod))
        shift = min(shift, w - 1)
        if shift == 0:
            return self._maybe_propagate(a)
        sign = self._sign_bit(a)
        logical = self.scalar_right_shift(a, shift)
        mask = ((1 << w) - 1) ^ ((1 << (w - shift)) - 1)
        extended = self.scalar_bitor(logical, mask)
        return self.cmux(sign, extended, logical)

    scalar_right_shift_arithmetic_parallelized = scalar_right_shift_arithmetic

    def right_shift_arithmetic(self, a: RadixCiphertext,
                               amount: RadixCiphertext) -> RadixCiphertext:
        """Sign-extending shift by an encrypted amount: the same cmux ladder
        as right_shift with arithmetic rungs — or the GGSW fast path with
        nb sign-fill blocks packed behind the data (shift_key.py)."""
        from .shift_key import _shift_rotate_ggsw, ggsw_shift_supported
        total = a.num_blocks * int(math.log2(self.msg_mod))
        # like rotates, ashr needs a power-of-two total width: for non-pow2
        # totals the selector can reach block shifts >= nb while only nb
        # sign-fill blocks are packed behind the data, so the extraction
        # window would read unoccupied zero coefficients instead of sign fill
        if (total & (total - 1)) == 0 and ggsw_shift_supported(
                self.shift_key, self.msg_mod, a.num_blocks,
                amount.num_blocks):
            return _shift_rotate_ggsw(self, a, amount, "ashr")
        total_bits = a.num_blocks * int(math.log2(self.msg_mod))
        n_sel = max(1, int(math.ceil(math.log2(total_bits))))
        bits = self._amount_bits(amount, n_sel)
        out = self._maybe_propagate(a)
        for i, bit in enumerate(bits):
            if bit is None:
                continue
            shifted = self.scalar_right_shift_arithmetic(out, 1 << i)
            out = self.cmux(BooleanBlock(block=bit), shifted, out)
        return out

    right_shift_arithmetic_parallelized = right_shift_arithmetic

    # ------------------------------------------------------------------
    # overflowing variants (reference unsigned/signed_overflowing_* and the
    # scalar twins)
    # ------------------------------------------------------------------

    def unsigned_overflowing_scalar_add(self, a: RadixCiphertext, scalar: int):
        triv = self.create_trivial_radix(scalar, a.num_blocks, a.batch_shape)
        return self.unsigned_overflowing_add(a, triv)

    def unsigned_overflowing_scalar_sub(self, a: RadixCiphertext, scalar: int):
        borrow = self.scalar_lt(a, scalar)
        return self.scalar_sub(a, scalar), borrow

    def _pack3_bool(self, x: Block, y: Block, z: Block, f) -> Block:
        """LUT over three degree-1 blocks packed as 4x+2y+z (needs
        max_degree ≥ 7, true for every carry ≥ 2 parameter set)."""
        packed = x.with_(
            lwe=LweCiphertext(data=x.lwe.data * jnp.uint64(4)
                              + y.lwe.data * jnp.uint64(2) + z.lwe.data),
            degree=4 * x.degree + 2 * y.degree + z.degree,
            noise_level=4 * x.noise_level + 2 * y.noise_level + z.noise_level)
        lut = self.key.generate_lookup_table(
            lambda v: int(f((v >> 2) & 1, (v >> 1) & 1, v & 1)))
        return self.key.apply_lookup_table(packed, lut)

    def signed_overflowing_add(self, a: RadixCiphertext, b: RadixCiphertext):
        """(sum mod 2^w, overflow): overflow ⇔ operands share a sign the
        result doesn't (reference signed_overflowing_add_parallelized)."""
        sa, sb = self._sign_bit(a), self._sign_bit(b)
        s = self.add_parallelized(a, b)
        sr = self._sign_bit(s)
        ov = self._pack3_bool(sa.block, sb.block, sr.block,
                              lambda x, y, z: x == y and x != z)
        return s, BooleanBlock(block=ov)

    def signed_overflowing_sub(self, a: RadixCiphertext, b: RadixCiphertext):
        sa, sb = self._sign_bit(a), self._sign_bit(b)
        d = self.sub(a, b)
        sr = self._sign_bit(d)
        ov = self._pack3_bool(sa.block, sb.block, sr.block,
                              lambda x, y, z: x != y and x != z)
        return d, BooleanBlock(block=ov)

    def signed_overflowing_scalar_add(self, a: RadixCiphertext, scalar: int):
        w = a.num_blocks * int(math.log2(self.msg_mod))
        triv = self.create_trivial_radix(scalar % (1 << w), a.num_blocks,
                                         a.batch_shape)
        return self.signed_overflowing_add(a, triv)

    def signed_overflowing_scalar_sub(self, a: RadixCiphertext, scalar: int):
        w = a.num_blocks * int(math.log2(self.msg_mod))
        triv = self.create_trivial_radix(scalar % (1 << w), a.num_blocks,
                                         a.batch_shape)
        return self.signed_overflowing_sub(a, triv)

    # ------------------------------------------------------------------
    # CRT ops (reference integer/server_key/crt_parallel/)
    # ------------------------------------------------------------------

    def crt_add(self, a: CrtCiphertext, b: CrtCiphertext) -> CrtCiphertext:
        blocks = []
        for x, y, mi in zip(a.blocks, b.blocks, a.moduli):
            s = self.key.unchecked_add(x, y)
            blocks.append(self.key.evaluate_univariate(s, lambda v, mi=mi: v % mi))
        return CrtCiphertext(blocks=blocks, moduli=a.moduli)

    def crt_mul(self, a: CrtCiphertext, b: CrtCiphertext) -> CrtCiphertext:
        m = self.msg_mod
        blocks = []
        for x, y, mi in zip(a.blocks, b.blocks, a.moduli):
            # reduce each residue below msg_mod before packing
            xr = self.key.evaluate_univariate(x, lambda v, mi=mi: v % mi)
            yr = self.key.evaluate_univariate(y, lambda v, mi=mi: v % mi)
            packed = self.key.unchecked_bivariate_pack(xr, yr)
            blocks.append(self.key.apply_lookup_table(
                packed, self.key.generate_lookup_table(
                    lambda v, mi=mi: ((v // m) * (v % m)) % mi)))
        return CrtCiphertext(blocks=blocks, moduli=a.moduli)

    def crt_neg(self, a: CrtCiphertext) -> CrtCiphertext:
        blocks = [self.key.evaluate_univariate(x, lambda v, mi=mi: (-v) % mi)
                  for x, mi in zip(a.blocks, a.moduli)]
        return CrtCiphertext(blocks=blocks, moduli=a.moduli)

    def crt_scalar_add(self, a: CrtCiphertext, scalar: int) -> CrtCiphertext:
        blocks = [self.key.evaluate_univariate(x, lambda v, mi=mi, s=scalar: (v + s) % mi)
                  for x, mi in zip(a.blocks, a.moduli)]
        return CrtCiphertext(blocks=blocks, moduli=a.moduli)

    def crt_sub(self, a: CrtCiphertext, b: CrtCiphertext) -> CrtCiphertext:
        """Per-residue subtraction (reference crt sub via add of the
        residue-wise negation)."""
        return self.crt_add(a, self.crt_neg(b))

    def crt_scalar_sub(self, a: CrtCiphertext, scalar: int) -> CrtCiphertext:
        return self.crt_scalar_add(a, -scalar)

    def crt_scalar_mul(self, a: CrtCiphertext, scalar: int) -> CrtCiphertext:
        blocks = [self.key.evaluate_univariate(
                      x, lambda v, mi=mi, s=scalar: (v * s) % mi)
                  for x, mi in zip(a.blocks, a.moduli)]
        return CrtCiphertext(blocks=blocks, moduli=a.moduli)

    def pbs_crt_compliant_function(self, a: CrtCiphertext,
                                   f: Callable[[int], int]) -> CrtCiphertext:
        """Apply x ↦ f(x) residue-wise: valid whenever f commutes with the
        CRT projection, e.g. polynomials (reference
        pbs_crt_compliant_function_parallelized)."""
        blocks = [self.key.evaluate_univariate(x, lambda v, mi=mi: f(v) % mi)
                  for x, mi in zip(a.blocks, a.moduli)]
        return CrtCiphertext(blocks=blocks, moduli=a.moduli)

    def full_extract_message(self, a: CrtCiphertext) -> CrtCiphertext:
        """Reduce every residue block below its modulus (reference
        full_extract_message_assign_parallelized)."""
        blocks = [self.key.evaluate_univariate(x, lambda v, mi=mi: v % mi)
                  for x, mi in zip(a.blocks, a.moduli)]
        return CrtCiphertext(blocks=blocks, moduli=a.moduli)

    # the residue ops above already bootstrap every block, so the smart/
    # unchecked twins coincide with the defaults (reference crt_parallel)
    unchecked_crt_add = crt_add
    smart_crt_add = crt_add
    unchecked_crt_sub = crt_sub
    smart_crt_sub = crt_sub
    unchecked_crt_mul = crt_mul
    smart_crt_mul = crt_mul
    unchecked_crt_neg = crt_neg
    smart_crt_neg = crt_neg
    unchecked_crt_scalar_add = crt_scalar_add
    smart_crt_scalar_add = crt_scalar_add
    unchecked_crt_scalar_sub = crt_scalar_sub
    smart_crt_scalar_sub = crt_scalar_sub
    unchecked_crt_scalar_mul = crt_scalar_mul
    smart_crt_scalar_mul = crt_scalar_mul


def gen_keys(params="PARAM_MESSAGE_2_CARRY_2_KS_PBS", num_blocks: int = 4,
             seed: int = 0, shift_key=None):
    """→ (RadixClientKey, ServerKey) — reference integer::gen_keys_radix.

    shift_key: None (default, layered shifts), or a wopbs parameter set /
    named-set string / "auto" to also generate the GGSW-selector shift key
    (integer/shift_key.py)."""
    ck, sk = shortint.gen_keys(params, seed=seed)
    shk = None
    if shift_key is not None:
        from .shift_key import new_shift_key
        shk = new_shift_key(ck, sk, shift_key, seed=seed)
    return (RadixClientKey(key=ck, num_blocks=num_blocks),
            ServerKey(key=sk, shift_key=shk))
