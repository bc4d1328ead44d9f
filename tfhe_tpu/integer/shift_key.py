"""GGSW-selector shifts and rotates by an encrypted amount.

Reference semantics: integer/server_key/radix_parallel/{shift,rotate}.rs —
a cmux barrel over the amount's bits, which costs ~181 block-PBS for a
uint32 at 2_2.  TPU-native redesign built on the combined WoP-PBS regime
(shortint/wopbs.py `new_wopbs_key`, reference shortint/engine/wopbs/mod.rs:50):

  1. the amount's block-granular bits are circuit-bootstrapped into GGSWs
     *directly* — one wopbs-regime PBS per (bit, cbs level) with a raw-torus
     LUT emitting bit·q/B^l, skipping the reference's sequential
     extract_bits + homomorphic_shift_boolean pair (wop_pbs/mod.rs:66,370);
  2. the radix blocks are packed into ONE GLWE polynomial with a packing
     keyswitch (compute-big LWE -> wopbs GLWE key), doubled for rotates;
  3. the whole block-granular shift is log2(nb) cmux *external products*
     (X^{±2^j} monomials) — no per-block PBS at all;
  4. one final 2-LUT refresh sweep applies the sub-block bit shift and
     returns fresh compute-regime blocks (the two LUT outputs occupy
     disjoint bit ranges, so their sum needs no carry handling).

Cost at uint32/2_2 with cbs = (base 4, level 4): 16 CBS PBS + 1 sub-bit
PBS + 31 refresh PBS = 48 PBS + 4 external products + 2 keyswitch passes,
vs ~154-181 PBS for the layered/barrel paths.

Noise (2_2 named set): per cmux the decomposition-rounding term dominates,
sigma ~= sqrt((1+kN)/2 * (q/B^l)^2 / 12) = 2^51.2 with B^l = 2^16; four
cmuxes + the 2x bivariate pack put 2^53.2 into the final refresh PBS, below
the compute path's own keyswitch+modswitch noise (2^54.9), keeping per-PBS
p_fail <= 2^-40.  The default cbs decomposition here is therefore (4, 4) —
deliberately finer than the wopbs named sets' (5, 3), which would land at
~2^-30.  The CASTING keyswitches matter even more: the combined regime's
stock double hop into the wopbs regime puts ~2^56 on every CBS read
(measured: 2 corrupted values in 2560 chained rotations on chip,
tools/pfail_shift.py) — the shift key therefore carries its own one-hop
casting KSKs at SHIFT_CAST_KS_DECOMP (base 4, 8 levels, key-noise term
~2^53.4, under the mod-switch floor).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import flax.struct as struct
import jax.numpy as jnp

from ..core import rng
from ..core.algorithms import generate_packing_keyswitch_key, sample_extract
from ..core.algorithms.keyswitch import (_static_monomial_mul,
                                         packing_keyswitch_lwe_list_to_glwe)
from ..core.algorithms.wopbs import (_monomial_div_static, cmux_ntt,
                                     ggsw_to_ntt,
                                     private_functional_keyswitch)
from ..core.entities import GgswCiphertext, GlweCiphertext, LweCiphertext
from ..core.params import DecompParams
from ..shortint.ciphertext import Ciphertext as Block
from ..shortint.ciphertext import NoiseLevel
from ..shortint.client_key import LOG_Q, ClientKey
from ..shortint.server_key import ServerKey as ShortintServerKey
from ..shortint.wopbs import (CombinedWopbsKey, _wopbs_client_key,
                              new_wopbs_key)

SHIFT_CBS_DECOMP = DecompParams(4, 4)

# deep casting-keyswitch decomposition for the shift path: base 4 x 8
# levels keeps the cast-KS key-noise term at ~2^53.4 — below the mod-switch
# floor — where routing through the combined regime's (compute-ks) +
# (wopbs-ks 6,2) double hop measures ~2^56 on the CBS reads and cost
# ~5e-5 p_fail per read (found by tools/pfail_shift.py: 2 corrupted
# values in 2560 chained rotations; PERFORMANCE.md round-4 notes)
SHIFT_CAST_KS_DECOMP = DecompParams(2, 8)


@struct.dataclass
class ShiftKey:
    """Key material for GGSW-selector shifts (see module docstring).

    wopbs:  the combined-regime WoP-PBS key (cbs pfpksk + wopbs params).
    pksk:   packing keyswitch key, compute-big LWE -> wopbs GLWE key, used
            to pack the radix blocks into one polynomial.
    cbs_server_key:     wopbs-regime ServerKey whose KSK casts compute-big
            -> wopbs-small DIRECTLY (one deep keyswitch instead of the
            combined regime's big->big + big->small double hop), so one
            apply_lookup_table takes an amount block straight into a
            wopbs-kernel CBS PBS.
    refresh_server_key: compute-regime ServerKey whose KSK casts
            wopbs-big -> compute-small with the same deep decomposition,
            for the final refresh sweep.
    """

    wopbs: CombinedWopbsKey
    pksk: Any
    cbs_server_key: Any = None
    refresh_server_key: Any = None
    cbs_decomp: DecompParams = struct.field(pytree_node=False,
                                            default=SHIFT_CBS_DECOMP)


def new_shift_key(ck: ClientKey, sk: ShortintServerKey, wparams="auto",
                  cbs_decomp: DecompParams = SHIFT_CBS_DECOMP,
                  seed: int = 0) -> ShiftKey:
    """Generate the shift key: a combined wopbs key, the block-packing
    keyswitch key (pfks-grade decomposition and noise, so packing noise
    stays negligible against the cmux chain), and the two deep direct
    casting KSKs (SHIFT_CAST_KS_DECOMP)."""
    from ..core.algorithms import generate_keyswitch_key
    wk = new_wopbs_key(ck, sk, wparams, seed=seed)
    wparams_resolved = wk.params
    wck = _wopbs_client_key(ck, wparams_resolved, seed)
    k_pk = rng.fork(rng.key_from_seed(seed), 0x5F1F)
    pksk = generate_packing_keyswitch_key(
        k_pk, ck.big_sk, wck.glwe_sk, wparams_resolved.pfks_decomp,
        wparams_resolved.pfks_noise_std, LOG_Q)
    k_in, k_out = rng.split(rng.fork(rng.key_from_seed(seed), 0x5F20))
    ksk_in = generate_keyswitch_key(k_in, ck.big_sk, wck.lwe_sk,
                                    SHIFT_CAST_KS_DECOMP,
                                    wparams_resolved.lwe_noise_std, LOG_Q)
    cbs_sk = ShortintServerKey(ksk=ksk_in, bsk=wk.wopbs_key.server_key.bsk,
                               params=wparams_resolved)
    ksk_out = generate_keyswitch_key(k_out, wck.big_sk, ck.lwe_sk,
                                     SHIFT_CAST_KS_DECOMP,
                                     ck.params.lwe_noise_std, LOG_Q)
    refresh_sk = ShortintServerKey(ksk=ksk_out, bsk=sk.bsk, params=ck.params)
    return ShiftKey(wopbs=wk, pksk=pksk, cbs_server_key=cbs_sk,
                    refresh_server_key=refresh_sk, cbs_decomp=cbs_decomp)


def ggsw_shift_supported(shift_key: Optional[ShiftKey], msg_mod: int,
                         num_blocks: int, amount_blocks: int) -> bool:
    """The GGSW path needs: a key, power-of-two bits-per-block, at least one
    block-granular selector bit, and polynomial room for the doubled rotate
    window."""
    if shift_key is None or shift_key.cbs_server_key is None:
        return False
    bp = int(math.log2(msg_mod))
    if bp <= 0 or (bp & (bp - 1)):
        return False
    total_bits = num_blocks * bp
    n_sel = max(1, math.ceil(math.log2(total_bits)))
    sb = int(math.log2(bp)) if bp > 1 else 0
    if n_sel <= sb:
        return False                       # no block-granular bits
    n_poly = shift_key.wopbs.params.polynomial_size
    return 3 * num_blocks <= n_poly


def _shift_rotate_ggsw(isk, a, amount, kind: str):
    """The GGSW shift (called from integer ServerKey._shift_rotate_by_encrypted).

    isk: the integer ServerKey (for _apply_luts_stacked and block helpers);
    a, amount: RadixCiphertexts; kind in {shl, shr, rotl, rotr}."""
    sk: ShiftKey = isk.shift_key
    wk = sk.wopbs
    wsk = wk.wopbs_key.server_key          # wopbs-regime shortint server key
    m = isk.msg_mod
    carry = isk.key.carry_modulus
    space = m * carry
    bp = int(math.log2(m))
    sb = int(math.log2(bp)) if bp > 1 else 0
    a = isk._maybe_propagate(a)
    amount = isk._maybe_propagate(amount)
    nb = a.num_blocks
    total_bits = nb * bp
    n_sel = max(1, math.ceil(math.log2(total_bits)))
    cbs = sk.cbs_decomp
    lc = cbs.level

    # ---- 1. needed amount blocks (cast happens INSIDE the CBS apply: the
    # cbs_server_key's deep KSK maps compute-big -> wopbs-small directly) --
    need_g = sorted({j // bp for j in range(n_sel) if j // bp < amount.num_blocks})
    wblocks: Dict[int, Block] = {g: amount.blocks[g] for g in need_g}

    # ---- 2. one stacked wopbs-PBS round: CBS level LWEs + sub-block bits --
    jobs: List[Block] = []
    luts = []
    ggsw_bits: List[int] = []              # absolute amount-bit index per GGSW
    for j in range(sb, n_sel):
        g, o = divmod(j, bp)
        if g not in wblocks:
            continue                       # missing high block => bit is zero
        ggsw_bits.append(j)
        for lvl in range(1, lc + 1):
            alpha = 1 << (LOG_Q - cbs.base_log * lvl)
            vals = [((x >> o) & 1) * alpha for x in range(space)]
            jobs.append(wblocks[g])
            luts.append(wsk.generate_lookup_table_raw(vals))
    n_cbs = len(jobs)
    for t in range(sb):                    # sub-block bits at standard delta
        g, o = divmod(t, bp)
        if g in wblocks:
            jobs.append(wblocks[g])
            luts.append(wsk.generate_lookup_table(lambda x, o=o: (x >> o) & 1))
    outs = (isk._apply_luts_stacked(jobs, luts, sk=sk.cbs_server_key)
            if jobs else [])

    # ---- 3. assemble GGSWs: one PFPKS per (bit, level, row) ----------------
    pf = wk.wopbs_key.pfpksk
    glwe_size = pf.data.shape[0]
    hats, shoups = [], []
    for bi in range(len(ggsw_bits)):
        level_lwes = outs[bi * lc:(bi + 1) * lc]
        lv = jnp.stack([o.lwe.data for o in level_lwes], axis=-2)
        rows = []
        for r in range(glwe_size):
            glwe = private_functional_keyswitch(
                LweCiphertext(data=lv), pf.data[r], pf.decomp, LOG_Q)
            rows.append(glwe.data)          # [..., lc, k+1, N]
        gd = jnp.stack(rows, axis=-3)       # [..., lc, row, k+1, N]
        h, s = ggsw_to_ntt(GgswCiphertext(data=gd, decomp=cbs), LOG_Q)
        hats.append(h)
        shoups.append(s)
    subs = outs[n_cbs:]

    # ---- 4. pack the data blocks into one GLWE (doubled for rotates;
    # arithmetic shr appends nb sign-fill blocks so the sign extension
    # falls out of the same rotation) ----------------------------------------
    rotate = kind in ("rotl", "rotr")
    if rotate:
        blocks_list = a.blocks * 2
    elif kind == "ashr":
        sign = isk._sign_bit(a)                            # 1 PBS
        sign_fill = isk.key.unchecked_scalar_mul(sign.block, m - 1)
        blocks_list = a.blocks + [sign_fill] * nb
    else:
        blocks_list = a.blocks
    cts = jnp.stack([b.lwe.data for b in blocks_list], axis=-2)
    acc = packing_keyswitch_lwe_list_to_glwe(
        LweCiphertext(data=cts), sk.pksk, LOG_Q)

    # ---- 5. block-granular rotation: one cmux external product per bit -----
    left = kind in ("shl", "rotl")
    for bi, j in enumerate(ggsw_bits):
        nblk = 1 << (j - sb)               # shift in whole blocks
        if left:
            moved = GlweCiphertext(
                data=_static_monomial_mul(acc.data, jnp.int32(nblk)))
        else:
            moved = GlweCiphertext(data=_monomial_div_static(acc.data, nblk))
        acc = cmux_ntt(acc, moved, hats[bi], shoups[bi], cbs, LOG_Q)

    # ---- 6. extract the result window ---------------------------------------
    # shl: X^{+s} leaves out_i = a_{i-s} at coefficients 0..nb-1 (vacated low
    # coefficients wrap from the UNOCCUPIED top of the polynomial = zeros);
    # shr: X^{-s} pulls zeros down from the unoccupied range 16..31;
    # rotl: the doubled copy makes window nb..2nb-1 the wrapped rotation;
    # rotr: window 0..nb-1 over the doubled copy.
    base = nb if kind == "rotl" else 0
    n_ext = nb + 1 if kind == "ashr" else nb   # +1: top block's hi neighbour
    vs = [sample_extract(acc, base + i) for i in range(n_ext)]  # wopbs-big

    # ---- 7. sub-block bit shift + refresh through the casting PBS ----------
    def wb(lwe_ct, degree):
        return Block(lwe=lwe_ct, degree=degree, message_modulus=m,
                     carry_modulus=carry, noise_level=NoiseLevel.NOMINAL)

    psk = sk.refresh_server_key
    if sb == 0:
        lut_id = psk.generate_lookup_table(lambda x: x % m)
        blocks = isk._apply_luts_stacked([wb(v, m - 1) for v in vs[:nb]],
                                         [lut_id] * nb, sk=psk)
        return type(a)(blocks=blocks)

    # t = amount mod bp as one wopbs-big LWE at standard delta
    sub_data = subs[0].lwe.data
    for t_i in range(1, sb):
        sub_data = sub_data + subs[t_i].lwe.data * jnp.uint64(1 << t_i)

    def pack(v):
        return wb(LweCiphertext(data=v.data * jnp.uint64(bp) + sub_data),
                  (m - 1) * bp + bp - 1)

    if left:
        lut_lo = psk.generate_lookup_table(
            lambda x: ((x // bp) << (x % bp)) % m)
        lut_hi = psk.generate_lookup_table(
            lambda x: ((x // bp) >> (bp - (x % bp))) if (x % bp) else 0)
    else:
        lut_lo = psk.generate_lookup_table(
            lambda x: (x // bp) >> (x % bp))
        lut_hi = psk.generate_lookup_table(
            lambda x: (((x // bp) << (bp - (x % bp))) % m) if (x % bp) else 0)

    jobs2, luts2, slots = [], [], []
    for i in range(nb):
        jobs2.append(pack(vs[i]))
        luts2.append(lut_lo)
        slots.append(("lo", i))
        ni = i - 1 if left else i + 1      # neighbour donating the cross bits
        if rotate:
            ni %= nb
        elif kind != "ashr" and (ni < 0 or ni >= nb):
            continue                       # logical shifts fill with zeros
        jobs2.append(pack(vs[ni]))
        luts2.append(lut_hi)
        slots.append(("hi", i))
    outs2 = isk._apply_luts_stacked(jobs2, luts2, sk=psk)
    parts: Dict[int, List[Block]] = {}
    for (which, i), o in zip(slots, outs2):
        parts.setdefault(i, []).append(o)
    blocks = []
    for i in range(nb):
        ps = parts[i]
        out = ps[0]
        for extra in ps[1:]:
            # lo and hi occupy disjoint bit ranges: degree stays < m
            out = isk.key.unchecked_add(out, extra).with_(degree=m - 1)
        blocks.append(out)
    return type(a)(blocks=blocks)
