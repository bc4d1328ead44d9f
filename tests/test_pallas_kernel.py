"""Fused Pallas blind-rotation kernel vs the XLA reference path
(interpret mode on CPU; the compiled kernel runs on the TPU in bench.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_tpu.core import rng
from tfhe_tpu.core.algorithms import (bootstrap_key_to_ntt, decrypt_lwe,
                                      encrypt_lwe, generate_bootstrap_key,
                                      generate_glwe_secret_key,
                                      generate_lwe_secret_key,
                                      programmable_bootstrap, sample_extract,
                                      trivial_glwe)
from tfhe_tpu.core.algorithms.bootstrap import external_product_num_primes
from tfhe_tpu.core.algorithms.encryption import bootstrap_key_to_ntt_paired
from tfhe_tpu.core.entities import GlweCiphertext, LweCiphertext
from tfhe_tpu.core.params import TEST_PARAMS_SHORTINT as P
from tfhe_tpu.core.poly.pallas_ntt import blind_rotate_pallas

DELTA = np.uint64(1) << np.uint64(59)


@pytest.fixture(scope="module")
def pkeys():
    root = rng.key_from_seed(77)
    ks = rng.split(root, 4)
    lwe_sk = generate_lwe_secret_key(ks[0], P.lwe_dimension)
    glwe_sk = generate_glwe_secret_key(ks[1], P.glwe_dimension, P.polynomial_size)
    bsk_std = generate_bootstrap_key(ks[2], lwe_sk, glwe_sk, P.pbs_decomp,
                                     P.glwe_noise_std, 64)
    npr = external_product_num_primes(P.polynomial_size, P.glwe_size,
                                      P.pbs_decomp, 64)
    bsk = bootstrap_key_to_ntt(bsk_std, 64, npr)
    paired, paired_sh = bootstrap_key_to_ntt_paired(bsk, 64)
    return dict(lwe_sk=lwe_sk, glwe_sk=glwe_sk, bsk=bsk, paired=paired,
                paired_sh=paired_sh, big_sk=glwe_sk.as_lwe_secret_key(),
                enc_key=ks[3])


def _lut(f, p_space=16):
    n_poly = P.polynomial_size
    box = n_poly // p_space
    vals = np.repeat(np.array([f(i) % (2 * p_space) for i in range(p_space)],
                              dtype=np.uint64), box) * DELTA
    vals = np.roll(vals, -(box // 2))
    vals[-(box // 2):] = np.uint64(0) - vals[-(box // 2):]
    return trivial_glwe(jnp.asarray(vals), P.glwe_dimension, 64)


def test_pallas_blind_rotate_matches_xla(pkeys):
    f = lambda x: (3 * x + 1) % 16
    acc = _lut(f)
    msgs = jnp.arange(16, dtype=jnp.uint64) * DELTA
    ct = encrypt_lwe(pkeys["enc_key"], pkeys["lwe_sk"], msgs, P.lwe_noise_std, 64)

    # XLA reference result
    ref = programmable_bootstrap(ct, acc, pkeys["bsk"], 64)
    ref_dec = np.asarray((decrypt_lwe(ref, pkeys["big_sk"], 64)
                          + (DELTA >> np.uint64(1))) // DELTA) % 16

    # Pallas (interpret) result
    rotated = blind_rotate_pallas(acc.data, ct.data, pkeys["paired"],
                                  pkeys["paired_sh"], P.pbs_decomp,
                                  block_b=8, interpret=True)
    out = sample_extract(GlweCiphertext(data=rotated), 0)
    pal_dec = np.asarray((decrypt_lwe(out, pkeys["big_sk"], 64)
                          + (DELTA >> np.uint64(1))) // DELTA) % 16

    expect = [(3 * i + 1) % 16 for i in range(16)]
    np.testing.assert_array_equal(ref_dec, expect)
    np.testing.assert_array_equal(pal_dec, expect)


def test_pallas_odd_batch_padding(pkeys):
    """Batch not divisible by the tile exercises the padding path."""
    f = lambda x: x
    acc = _lut(f)
    msgs = jnp.asarray([1, 5, 9], dtype=jnp.uint64) * DELTA
    ct = encrypt_lwe(pkeys["enc_key"], pkeys["lwe_sk"], msgs, P.lwe_noise_std, 64)
    rotated = blind_rotate_pallas(acc.data, ct.data, pkeys["paired"],
                                  pkeys["paired_sh"], P.pbs_decomp,
                                  block_b=8, interpret=True)
    out = sample_extract(GlweCiphertext(data=rotated), 0)
    dec = np.asarray((decrypt_lwe(out, pkeys["big_sk"], 64)
                      + (DELTA >> np.uint64(1))) // DELTA) % 16
    np.testing.assert_array_equal(dec, [1, 5, 9])


def test_pallas_mxu_delta_blind_rotate(pkeys):
    """MXU four-step delta-CMUX kernel (plain GGSW spectra + table-gathered
    (X^a - 1) phases) vs the paired butterfly kernel.  The delta form keeps
    the accumulator's sub-gadget bits (no trivial-gadget rounding term), so
    the rotated accumulators differ in low noise bits — but both must
    decrypt to the same LUT outputs."""
    f = lambda x: (3 * x + 1) % 16
    acc = _lut(f)
    msgs = jnp.arange(16, dtype=jnp.uint64) * DELTA
    ct = encrypt_lwe(pkeys["enc_key"], pkeys["lwe_sk"], msgs, P.lwe_noise_std, 64)

    rot_ref = blind_rotate_pallas(acc.data, ct.data, pkeys["paired"],
                                  pkeys["paired_sh"], P.pbs_decomp,
                                  block_b=8, interpret=True)
    # the default key conversion (use_mxu_ntt) records the delta fourstep form
    bsk = pkeys["bsk"]
    assert bsk.paired_order == "fourstep" and bsk.paired.ndim == 5
    rot_mxu = blind_rotate_pallas(acc.data, ct.data, bsk.paired,
                                  bsk.paired_shoup, P.pbs_decomp,
                                  block_b=8, interpret=True, mxu=True)

    expect = [(3 * i + 1) % 16 for i in range(16)]
    for rot in (rot_ref, rot_mxu):
        out = sample_extract(GlweCiphertext(data=rot), 0)
        dec = np.asarray((decrypt_lwe(out, pkeys["big_sk"], 64)
                          + (DELTA >> np.uint64(1))) // DELTA) % 16
        np.testing.assert_array_equal(dec, expect)


def test_pallas_mxu_lanes_bit_exact(pkeys):
    """The "lanes" layout kernel (dense prime-paired stage A) computes the
    identical exact integer pipeline as the rows-layout delta kernel: the
    rotated u64 accumulators must be bit-identical."""
    f = lambda x: (x * 5 + 3) % 16
    acc = _lut(f)
    msgs = jnp.arange(16, dtype=jnp.uint64) * DELTA
    ct = encrypt_lwe(pkeys["enc_key"], pkeys["lwe_sk"], msgs, P.lwe_noise_std, 64)
    bsk = pkeys["bsk"]

    rot_rows = blind_rotate_pallas(acc.data, ct.data, bsk.paired,
                                   bsk.paired_shoup, P.pbs_decomp,
                                   block_b=8, interpret=True, mxu=True)
    rot_lanes = blind_rotate_pallas(acc.data, ct.data, bsk.paired,
                                    bsk.paired_shoup, P.pbs_decomp,
                                    block_b=8, interpret=True, mxu=True,
                                    lanes=True)
    np.testing.assert_array_equal(np.asarray(rot_rows), np.asarray(rot_lanes))

    out = sample_extract(GlweCiphertext(data=rot_lanes), 0)
    dec = np.asarray((decrypt_lwe(out, pkeys["big_sk"], 64)
                      + (DELTA >> np.uint64(1))) // DELTA) % 16
    np.testing.assert_array_equal(dec, [(i * 5 + 3) % 16 for i in range(16)])


def test_pallas_fused_rotation_bit_exact(pkeys):
    """The single-kernel whole-rotation driver (resident accumulator,
    pipelined BSK, in-kernel phase DMA) computes the same exact integer
    pipeline as the per-step delta kernel: bit-identical accumulators."""
    from tfhe_tpu.core.poly.pallas_ntt import blind_rotate_fused

    f = lambda x: (7 * x + 2) % 16
    acc = _lut(f)
    msgs = jnp.arange(16, dtype=jnp.uint64) * DELTA
    ct = encrypt_lwe(pkeys["enc_key"], pkeys["lwe_sk"], msgs, P.lwe_noise_std, 64)
    bsk = pkeys["bsk"]

    rot_step = blind_rotate_pallas(acc.data, ct.data, bsk.paired,
                                   bsk.paired_shoup, P.pbs_decomp,
                                   block_b=8, interpret=True, mxu=True)
    rot_fused = blind_rotate_fused(acc.data, ct.data, bsk.paired,
                                   bsk.paired_shoup, None, None,
                                   P.pbs_decomp, block_b=8, interpret=True,
                                   mode="delta")
    np.testing.assert_array_equal(np.asarray(rot_step), np.asarray(rot_fused))

    out = sample_extract(GlweCiphertext(data=rot_fused), 0)
    dec = np.asarray((decrypt_lwe(out, pkeys["big_sk"], 64)
                      + (DELTA >> np.uint64(1))) // DELTA) % 16
    np.testing.assert_array_equal(dec, [(7 * i + 2) % 16 for i in range(16)])


def test_pallas_fused_sub_blockdiag_bit_exact(pkeys, monkeypatch):
    """TFHE_TPU_SUBBT=2 (dense per-pair dots for the blockdiagonal MXU
    stages) is bit-identical to the default bt-blockdiagonal embedding."""
    from tfhe_tpu.core.poly.pallas_ntt import blind_rotate_fused

    f = lambda x: (5 * x + 3) % 16
    acc = _lut(f)
    msgs = jnp.arange(16, dtype=jnp.uint64) * DELTA
    ct = encrypt_lwe(pkeys["enc_key"], pkeys["lwe_sk"], msgs, P.lwe_noise_std, 64)
    bsk = pkeys["bsk"]
    base = blind_rotate_fused(acc.data, ct.data, bsk.paired, bsk.paired_shoup,
                              None, None, P.pbs_decomp, block_b=8,
                              interpret=True, mode="delta")
    monkeypatch.setenv("TFHE_TPU_SUBBT", "2")
    sub = blind_rotate_fused(acc.data, ct.data, bsk.paired, bsk.paired_shoup,
                             None, None, P.pbs_decomp, block_b=8,
                             interpret=True, mode="delta")
    np.testing.assert_array_equal(np.asarray(base), np.asarray(sub))


def test_pallas_fused_factored_phase_bit_exact(pkeys):
    """The factored phase stack (X^{e_lo} x X^{S e_hi} rows + in-kernel
    recombination, the N >= 16384 form that kills the O(N^2) table) computes
    the same residues mod every prime as the full (X^e - 1) table, so the
    Garner output is bit-identical.  Forced here at test N by passing the
    split stack explicitly."""
    from tfhe_tpu.core.poly import fourstep as fs
    from tfhe_tpu.core.poly.pallas_ntt import blind_rotate_fused

    f = lambda x: (11 * x + 6) % 16
    acc = _lut(f)
    msgs = jnp.arange(16, dtype=jnp.uint64) * DELTA
    ct = encrypt_lwe(pkeys["enc_key"], pkeys["lwe_sk"], msgs, P.lwe_noise_std, 64)
    bsk = pkeys["bsk"]
    npr = bsk.paired.shape[1]
    n = P.polynomial_size

    full = blind_rotate_fused(acc.data, ct.data, bsk.paired, bsk.paired_shoup,
                              bsk.mono, bsk.mono_shoup, P.pbs_decomp,
                              block_b=8, interpret=True, mode="delta")
    stab, stab_sh = fs.monomial_split_tables(n, npr)
    assert stab.shape[0] != 2 * n
    split = blind_rotate_fused(acc.data, ct.data, bsk.paired,
                               bsk.paired_shoup, jnp.asarray(stab),
                               jnp.asarray(stab_sh), P.pbs_decomp,
                               block_b=8, interpret=True, mode="delta")
    np.testing.assert_array_equal(np.asarray(full), np.asarray(split))

    out = sample_extract(GlweCiphertext(data=split), 0)
    dec = np.asarray((decrypt_lwe(out, pkeys["big_sk"], 64)
                      + (DELTA >> np.uint64(1))) // DELTA) % 16
    np.testing.assert_array_equal(dec, [(11 * i + 6) % 16 for i in range(16)])


def test_pallas_multibit_matches_xla():
    """Fused multibit kernel (g=2) vs the XLA multibit path, interpret mode."""
    import dataclasses
    from tfhe_tpu import shortint
    from tfhe_tpu.core.params import MultiBitPBSParameters
    from tfhe_tpu.core.poly.pallas_ntt import multi_bit_blind_rotate_pallas

    params = MultiBitPBSParameters(
        name="TEST_MB", grouping_factor=2,
        **{f.name: getattr(P, f.name)
           for f in dataclasses.fields(P) if f.name not in ("name", "ciphertext_modulus")})
    from tfhe_tpu import config as _cfg
    _cfg.set_use_mxu_ntt(False)   # keygen in DIF order; fourstep applied below
    try:
        ck, sk = shortint.gen_keys(params, seed=101)
    finally:
        _cfg.set_use_mxu_ntt(True)
    M = params.message_modulus
    msgs = jnp.arange(M, dtype=jnp.uint64)
    ct = ck.encrypt(msgs, seed=102)
    lut = sk.generate_lookup_table(lambda x: (x + 2) % M)

    # XLA path result
    from tfhe_tpu import config as tconfig
    tconfig.set_use_pallas_pbs(False)
    out_ref = sk.apply_lookup_table(ct, lut)
    ref = np.asarray(ck.decrypt(out_ref))

    # Pallas (interpret) result on the same inputs
    from tfhe_tpu.core.algorithms import keyswitch_lwe
    small = keyswitch_lwe(ct.lwe, sk.ksk, 64)
    rotated = multi_bit_blind_rotate_pallas(
        lut.acc.data, small.data, sk.bsk.data_u32, sk.bsk.shoup_u32,
        sk.bsk.decomp, 2, block_b=8, interpret=True)
    out = sample_extract(GlweCiphertext(data=rotated), 0)
    from tfhe_tpu.shortint.client_key import delta_for
    d = delta_for(params)
    dec = np.asarray((decrypt_lwe(out, ck.big_sk, 64) + (d >> np.uint64(1))) // d) % (2 * M * params.carry_modulus)
    np.testing.assert_array_equal(ref, (np.arange(M) + 2) % M)
    np.testing.assert_array_equal(dec % M, (np.arange(M) + 2) % M)

    # MXU four-step kernel: bit-identical rotated accumulator
    from tfhe_tpu.core.poly.fourstep import perm_from_dif
    perm = jnp.asarray(perm_from_dif(P.polynomial_size))
    rotated_mxu = multi_bit_blind_rotate_pallas(
        lut.acc.data, small.data, sk.bsk.data_u32[..., perm],
        sk.bsk.shoup_u32[..., perm], sk.bsk.decomp, 2, block_b=8,
        interpret=True, mxu=True)
    np.testing.assert_array_equal(np.asarray(rotated), np.asarray(rotated_mxu))

    # lanes-layout MXU kernel: also bit-identical
    rotated_lanes = multi_bit_blind_rotate_pallas(
        lut.acc.data, small.data, sk.bsk.data_u32[..., perm],
        sk.bsk.shoup_u32[..., perm], sk.bsk.decomp, 2, block_b=8,
        interpret=True, mxu=True, lanes=True)
    np.testing.assert_array_equal(np.asarray(rotated),
                                  np.asarray(rotated_lanes))

    # fused whole-rotation kernel (multibit mode): also bit-identical
    from tfhe_tpu.core.poly.pallas_ntt import blind_rotate_fused
    rotated_fused = blind_rotate_fused(
        lut.acc.data, small.data, sk.bsk.data_u32[..., perm],
        sk.bsk.shoup_u32[..., perm], None, None, sk.bsk.decomp,
        block_b=8, interpret=True, mode="multibit", grouping=2)
    np.testing.assert_array_equal(np.asarray(rotated),
                                  np.asarray(rotated_fused))


def test_batch_bucketing_math():
    """Padded flat batch: tile multiples up to 4 tiles, then the
    {2^k, 3*2^(k-1)} geometric buckets (compile-count cap for the
    integer layer's varying stacked-block batches)."""
    from tfhe_tpu import config
    from tfhe_tpu.core.poly.pallas_ntt import _padded_flat_batch

    assert _padded_flat_batch(1, 8) == 8
    assert _padded_flat_batch(17, 8) == 24
    assert _padded_flat_batch(32, 8) == 32
    assert _padded_flat_batch(33, 8) == 48
    assert _padded_flat_batch(49, 8) == 64
    assert _padded_flat_batch(65, 8) == 96
    assert _padded_flat_batch(512, 8) == 512
    assert _padded_flat_batch(513, 8) == 768
    assert _padded_flat_batch(1537, 8) == 2048
    assert _padded_flat_batch(3, 3) == 3
    # every bucket is a tile multiple and within 1.5x of the tiled request
    for b in range(1, 4000, 7):
        p = _padded_flat_batch(b, 8)
        tiled = b + (-b) % 8
        assert p % 8 == 0 and p >= b and p * 2 <= max(8 * 8, 3 * tiled)
    config.set_bucket_pbs_batch(False)
    try:
        assert _padded_flat_batch(33, 8) == 40
        assert _padded_flat_batch(513, 8) == 520
    finally:
        config.set_bucket_pbs_batch(True)


def test_pallas_batched_luts(pkeys):
    """Per-batch-element LUTs (the integer layer's many-LUT stacking:
    distinct LUTs ride the PBS batch axis) through the fused kernel —
    matches the XLA path element-wise."""
    from tfhe_tpu.core.algorithms.bootstrap import blind_rotate
    from tfhe_tpu.core.poly.pallas_ntt import blind_rotate_fused

    f0 = lambda x: (3 * x + 1) % 16
    f1 = lambda x: (x * x) % 16
    acc0, acc1 = _lut(f0), _lut(f1)
    # batch of 6, alternating LUTs; batch 6 also exercises tile padding
    luts = jnp.stack([acc0.data, acc1.data] * 3)            # [6, k+1, N]
    msgs = jnp.asarray([0, 1, 5, 9, 12, 15], dtype=jnp.uint64) * DELTA
    ct = encrypt_lwe(pkeys["enc_key"], pkeys["lwe_sk"], msgs, P.lwe_noise_std, 64)
    bsk = pkeys["bsk"]

    rot = blind_rotate_fused(luts, ct.data, bsk.paired, bsk.paired_shoup,
                             None, None, P.pbs_decomp, block_b=8,
                             interpret=True, mode="delta")
    dec_p = _dec16(rot, pkeys)

    ref = blind_rotate(GlweCiphertext(data=luts),
                       LweCiphertext(data=ct.data), bsk, 64)
    dec_x = _dec16(ref.data, pkeys)

    expect = [f1(m) if i % 2 else f0(m)
              for i, m in enumerate([0, 1, 5, 9, 12, 15])]
    np.testing.assert_array_equal(dec_p, expect)
    np.testing.assert_array_equal(dec_x, expect)


def _dec16(rotated, pkeys):
    out = sample_extract(GlweCiphertext(data=jnp.asarray(rotated)), 0)
    return np.asarray((decrypt_lwe(out, pkeys["big_sk"], 64)
                       + (DELTA >> np.uint64(1))) // DELTA) % 16
