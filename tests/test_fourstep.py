"""Four-step MXU NTT: reference-transform equivalence, roundtrips, and an
exact numpy simulation of the int8 limb-matmul scheme (the same arithmetic
the Pallas kernel performs, validated against the u64 reference)."""
import numpy as np
import pytest

from tfhe_tpu.core.poly import ntt
from tfhe_tpu.core.poly import fourstep as fs


def _rand_residues(rs, n, npr, batch=3):
    plan = ntt.get_plan(n, npr)
    p = np.asarray(plan.p64[:, 0])
    return (rs.randint(0, 1 << 30, size=(batch, npr, n)).astype(np.uint64)
            % p[None, :, None])


@pytest.mark.parametrize("n,npr", [(256, 4), (512, 3), (2048, 4), (64, 2)])
def test_forward_matches_dif_with_perm(rs, n, npr):
    res = _rand_residues(rs, n, npr)
    four = fs.fourstep_forward_ref(n, npr, res)
    dif = np.asarray(ntt._dif_forward(ntt.get_plan(n, npr),
                                      __import__("jax.numpy", fromlist=["x"]).asarray(res)))
    perm = fs.perm_from_dif(n)
    np.testing.assert_array_equal(four, dif[..., perm])


@pytest.mark.parametrize("n,npr", [(256, 4), (2048, 4)])
def test_roundtrip(rs, n, npr):
    res = _rand_residues(rs, n, npr)
    back = fs.fourstep_inverse_ref(n, npr, fs.fourstep_forward_ref(n, npr, res))
    np.testing.assert_array_equal(back, res)


# ---------------------------------------------------------------------------
# exact numpy simulation of the kernel's int8 limb pipeline
# ---------------------------------------------------------------------------


def _sim_left(stack, corr, d_row, data_u32, p, k_limbs, bt, m_dim):
    """Simulate: out = W_blockdiag @ data, data limbs = (u_k - 128) int8.
    data_u32 [bt*K, L] -> u32 result [bt*M, L] congruent mod p, < 4p."""
    rows = data_u32.shape[0]
    limbs = []
    for k in range(k_limbs):
        u = (data_u32 >> (8 * k)) & 255
        limbs.append(u.astype(np.int64) - 128)
    data = np.concatenate(limbs, axis=0)                  # [k*bt*K, L]
    out = stack.astype(np.int64) @ data                   # [4*bt*M, L]
    s = out.reshape(4, bt, m_dim, -1)
    sp = s + corr[:, None, :, :].astype(np.int64)         # +128*rowsum+BIAS
    assert np.all(sp >= 0) and np.all(sp < (1 << 26)), "S' bound"
    return _sim_recombine(sp, d_row, p).reshape(bt * m_dim, -1)


def _sim_right(stack, corr, d_const, data_u32, p, k_limbs=4):
    limbs = []
    for k in range(k_limbs):
        u = (data_u32 >> (8 * k)) & 255
        limbs.append(u.astype(np.int64) - 128)
    data = np.concatenate(limbs, axis=1)                  # [R, k*K]
    out = data @ stack.astype(np.int64)                   # [R, 4*M]
    m = stack.shape[1] // 4
    s = np.stack([out[:, i * m:(i + 1) * m] for i in range(4)])
    sp = s + corr.astype(np.int64)
    assert np.all(sp >= 0) and np.all(sp < (1 << 26)), "S' bound"
    return _sim_recombine(sp[:, None], d_const, p)[0]


def _sim_recombine(sp, d_add, p):
    """sp [4, b?, M, L] nonneg < 2^26 -> u32 < 4p congruent to
    sum_m 2^{8m} sp_m + d_add (mod p), exactly as the kernel computes it."""
    a = sp[1] & 0xFFFF
    b = sp[1] >> 16
    c = sp[2] & 0xFF
    d = sp[2] >> 8
    L = sp[0] + (a << 8) + (c << 16)
    H = b + d + sp[3]
    assert np.all(L < (1 << 27)) and np.all(H < (1 << 26))
    c24, c24s, c16, c16s = fs.recomb_consts(p)
    T = _lazy(H, c24, c24s, p)
    Y = L + T + d_add
    assert np.all(Y < (1 << 32))
    R = (Y & 0xFFFF) + _lazy(Y >> 16, c16, c16s, p)
    assert np.all(R < 4 * p)
    assert np.all(R % p == (sp[0] + (sp[1] << 8) + (sp[2] << 16) + (sp[3] << 24)
                            + d_add) % p)
    return R


def _lazy(a, w, ws, p):
    """mulmod_lazy with the kernel's approximate mulhi (numpy int64 exact)."""
    a0, a1 = a & 0xFFFF, a >> 16
    b0, b1 = ws & 0xFFFF, ws >> 16
    q = a1 * b1 + ((a1 * b0) >> 16) + ((a0 * b1) >> 16)
    r = (a * w - q * p) & 0xFFFFFFFF
    r = np.where(r >= 2 * p, r - 2 * p, r)
    assert np.all(r < 2 * p)
    return r


@pytest.mark.parametrize("n,npr,bt", [(256, 4, 8), (2048, 4, 2)])
def test_limb_pipeline_full_forward(rs, n, npr, bt):
    """digits -> (stage A + twiddle + stage B) via int8 limbs == reference."""
    plan = ntt.get_plan(n, npr)
    fp = fs.get_fourstep_plan(n, npr)
    kt = fs.get_kernel_tables(n, npr, bt)
    n1, n2 = fp.n1, fp.n2
    digits = rs.randint(-(1 << 22), 1 << 22, size=(bt, n)).astype(np.int64)

    for pi, p in enumerate(plan.primes):
        # reference: residues of signed digits -> fourstep forward
        res = np.where(digits < 0, digits + p, digits).astype(np.uint64)
        want = fs.fourstep_forward_ref(n, npr, np.broadcast_to(
            res[:, None, :], (bt, npr, n)).copy())[:, pi]

        u = (digits + fs.DIGIT_OFF).astype(np.uint64)     # < 2^24
        x1 = _sim_left(kt.wfa[pi], kt.ca[pi], kt.da[pi].astype(np.int64),
                       u.reshape(bt * n1, n2), p, 3, bt, n1)
        # twiddle (lazy)
        tfv = np.broadcast_to(kt.tf[pi].astype(np.int64), (bt, n1, n2))
        tfs = np.broadcast_to(kt.tf_sh[pi].astype(np.int64), (bt, n1, n2))
        x1t = _lazy(x1.reshape(bt, n1, n2), tfv, tfs, p)
        # stage B (dense over lanes)
        x2 = _sim_right(kt.wfb[pi], kt.cb[pi],
                        int(fs.BIAS_SUM * -1 % p), x1t.reshape(bt * n1, n2), p)
        got = (x2 % p).reshape(bt, n1, n2).reshape(bt, n)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n,npr,bt", [(256, 4, 8), (2048, 4, 2)])
def test_limb_pipeline_full_inverse(rs, n, npr, bt):
    plan = ntt.get_plan(n, npr)
    fp = fs.get_fourstep_plan(n, npr)
    kt = fs.get_kernel_tables(n, npr, bt)
    n1, n2 = fp.n1, fp.n2

    for pi, p in enumerate(plan.primes):
        spec = rs.randint(0, p, size=(bt, n)).astype(np.uint64)
        want = fs.fourstep_inverse_ref(n, npr, np.broadcast_to(
            spec[:, None, :], (bt, npr, n)).copy())[:, pi]

        # lazy-domain input < 2p as the kernel's MAC produces
        lazy_in = spec + (rs.randint(0, 2, size=spec.shape) * p).astype(np.uint64)
        d = _sim_right(kt.wia[pi], kt.cia[pi], int(fs.BIAS_SUM * -1 % p),
                       lazy_in.reshape(bt * n1, n2), p)
        tiv = np.broadcast_to(kt.ti[pi].astype(np.int64), (bt, n1, n2))
        tis = np.broadcast_to(kt.ti_sh[pi].astype(np.int64), (bt, n1, n2))
        dt = _lazy(d.reshape(bt, n1, n2), tiv, tis, p)
        x = _sim_left(kt.wib[pi], kt.cib[pi], kt.dib[pi].astype(np.int64),
                      dt.reshape(bt * n1, n2), p, 4, bt, n1)
        got = (x % p).reshape(bt, n)
        np.testing.assert_array_equal(got, want)


def test_monomial_tables_fourstep(rs):
    """X^e spectra via radix-4 tables match ntt_forward of the monomial."""
    import jax.numpy as jnp
    n, npr = 256, 4
    plan = ntt.get_plan(n, npr)
    tab, _ = fs.monomial_tables_fourstep(n, npr)
    perm = fs.perm_from_dif(n)
    for e in [1, 5, n - 1, n, 2 * n - 1, 3]:
        poly = np.zeros(n, dtype=np.int64)
        if e % (2 * n) < n:
            poly[e % (2 * n)] = 1
        else:
            poly[e % (2 * n) - n] = -1
        want = np.asarray(ntt.ntt_forward(plan, jnp.asarray(poly)))[:, perm]
        # compose from radix-4 crumbs
        acc = np.ones((npr, n), dtype=object)
        for lvl in range((int(np.log2(2 * n)) + 1) // 2):
            v = (e >> (2 * lvl)) & 3
            if v:
                t = tab[lvl, v - 1].reshape(npr, n).astype(object)
                acc = acc * t
        got = np.empty((npr, n), dtype=np.uint64)
        for pi, p in enumerate(plan.primes):
            got[pi] = (acc[pi] % p).astype(np.uint64)
        np.testing.assert_array_equal(got, want)
