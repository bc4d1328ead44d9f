"""Multi-bit programmable bootstrapping.

Reference: algorithms/lwe_multi_bit_programmable_bootstrapping.rs and
lwe_multi_bit_bootstrap_key_{generation,conversion}.rs — groups of
`grouping_factor` key bits share one blind-rotation step.  The BSK stores,
per group j, 2^g GGSWs where GGSW_{j,v} encrypts the indicator
∏_i (s_i if v_i else 1-s_i) — i.e. 1 exactly when the group's key bits
equal v.  A step computes

    acc ← (Σ_v X^{c_v}·GGSW_{j,v}) ⊡ acc,   c_v = Σ_{i: v_i=1} ã_{jg+i},

since the bracketed sum encrypts the monomial X^{Σ ã_i s_i}.

TPU re-design: the reference multiplies Fourier GGSWs by complex phase
vectors from a std::thread worker pool (its HOT thread boundary, SURVEY §3.2);
here the *digit spectra* are multiplied by precomputed NTT monomial spectra
(X^{2^b} tables, binary exponentiation over the traced c_v) and MAC'd against
the Shoup-precomputed GGSW_v — so each step still costs one forward + one
inverse NTT pass, but there are n/g steps instead of n.  Execution is
deterministic by construction (the reference's `deterministic_execution`
flag is always-on here: no thread interleaving exists).
"""
from __future__ import annotations

import functools
import itertools

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np

from .. import rng
from ..decomposition import signed_decompose
from ..entities import GlweCiphertext, LweCiphertext
from ..params import DecompParams
from ..poly import (garner_to_torus, get_plan, monomial_mul,
                    ntt_forward, ntt_forward_digits, ntt_inverse)
from ..poly.ntt import addmod, mulmod_shoup
from .bootstrap import external_product_num_primes, modulus_switch
from .encryption import encrypt_constant_ggsw

U64 = jnp.uint64


@struct.dataclass
class NttMultiBitBootstrapKey:
    """data [n/g, 2^g, P, l*(k+1), k+1, N] uint64 + Shoup twin, plus uint32
    copies for the fused Pallas kernel."""

    data: jnp.ndarray
    shoup: jnp.ndarray = None
    data_u32: jnp.ndarray = None
    shoup_u32: jnp.ndarray = None
    # full-exponent X^e phase tables [2N, P, N1, N2] u32 + shoup for the MXU
    # kernel's gathered variant phases (fourstep.monomial_full_tables).
    # Derivable from (N, P); serialization regenerates them on load.
    mono: jnp.ndarray = None
    mono_shoup: jnp.ndarray = None
    decomp: DecompParams = struct.field(pytree_node=False, default=None)
    grouping_factor: int = struct.field(pytree_node=False, default=2)
    log_q: int = struct.field(pytree_node=False, default=64)
    # spectral ordering of the u32 copies: 'dif' or 'fourstep' (MXU kernel)
    u32_order: str = struct.field(pytree_node=False, default="dif")

    @property
    def num_groups(self) -> int:
        return self.data.shape[0]

    @property
    def input_lwe_dimension(self) -> int:
        return self.num_groups * self.grouping_factor

    @property
    def glwe_size(self) -> int:
        return self.data.shape[-2]

    @property
    def polynomial_size(self) -> int:
        return self.data.shape[-1]


def generate_multi_bit_bootstrap_key(key, lwe_sk, glwe_sk,
                                     decomp: DecompParams, grouping_factor: int,
                                     noise_std: float, log_q: int):
    """Standard-domain multibit BSK [n/g, 2^g, l, k+1, k+1, N]
    (reference generate_lwe_multi_bit_bootstrap_key)."""
    n_in = lwe_sk.lwe_dimension
    g = grouping_factor
    assert n_in % g == 0, "lwe_dimension must be a multiple of grouping_factor"
    ng, nv = n_in // g, 1 << g
    bits = lwe_sk.bits.astype(jnp.int32).reshape(ng, g)

    # indicator messages [ng, 2^g]: ∏_i (s_i if v_i else 1-s_i);
    # bit order matches the reference (MSB of v ↔ first bit of group)
    msgs = jnp.ones((ng, nv), jnp.int32)
    for i in range(g):
        for v in range(nv):
            v_bit = (v >> (g - 1 - i)) & 1
            s = bits[:, i]
            msgs = msgs.at[:, v].multiply(s if v_bit else (1 - s))

    keys = rng.split(key, ng * nv)

    def one(subkey, msg):
        return encrypt_constant_ggsw(subkey, glwe_sk, msg, decomp,
                                     noise_std, log_q).data

    data = jax.vmap(one)(keys, msgs.reshape(-1))
    return data.reshape((ng, nv) + data.shape[1:])


def multi_bit_bootstrap_key_to_ntt(std_data, decomp: DecompParams,
                                   grouping_factor: int,
                                   log_q: int) -> NttMultiBitBootstrapKey:
    ng, nv, levels, glwe_size, _, n = std_data.shape
    npr = external_product_num_primes(n, glwe_size, decomp, log_q)
    plan = get_plan(n, npr)
    hat = ntt_forward(plan, std_data)          # [ng, v, l, row, comp, P, N]
    hat = jnp.moveaxis(hat, -2, 2)             # [ng, v, P, l, row, comp, N]
    hat = hat.reshape(ng, nv, npr, levels * glwe_size, glwe_size, n)
    p64 = jnp.asarray(plan.p64[:, None, None, :])
    sh = (hat << U64(32)) // p64
    from ... import config
    order = "dif"
    mono = mono_sh = None
    hat32, sh32 = hat.astype(jnp.uint32), sh.astype(jnp.uint32)
    if config.use_mxu_ntt():
        from ..poly.fourstep import (monomial_full_tables,
                                     monomial_full_tables_lanes, perm_from_dif)
        perm = jnp.asarray(perm_from_dif(n))
        hat32, sh32 = hat32[..., perm], sh32[..., perm]
        if config.use_mxu_lanes():
            tab, tab_sh = monomial_full_tables_lanes(n, npr, False)
            order = "fourstep-lanes"
        else:
            tab, tab_sh = monomial_full_tables(n, npr, False)
            order = "fourstep"
        mono, mono_sh = jnp.asarray(tab), jnp.asarray(tab_sh)
    return NttMultiBitBootstrapKey(data=hat, shoup=sh,
                                   data_u32=hat32, shoup_u32=sh32,
                                   mono=mono, mono_shoup=mono_sh,
                                   decomp=decomp, u32_order=order,
                                   grouping_factor=grouping_factor, log_q=log_q)


@functools.lru_cache(maxsize=None)
def _monomial_pow_tables(n: int, num_primes: int):
    """Spectra of X^(2^b) for b in 0..log2(2N)-1, with Shoup twins:
    [(tables [B_exp, P, N], shoup)] for binary exponentiation of X^c."""
    plan = get_plan(n, num_primes)
    nb = int(np.log2(2 * n))
    polys = np.zeros((nb, n), dtype=np.int64)
    for b in range(nb):
        e = 1 << b
        if e < n:
            polys[b, e] = 1
        else:  # X^N = -1 (only b = log2(N): e == n)
            polys[b, e - n] = -1
    with jax.ensure_compile_time_eval():   # may be first called inside a trace
        hat = np.asarray(ntt_forward(plan, jnp.asarray(polys)))  # [nb, P, N]
    sh = np.array([[[(int(x) << 32) // int(p) for x in row]
                    for row, p in zip(mat, plan.primes)] for mat in hat],
                  dtype=np.uint64)
    # return numpy (not jnp) so the lru_cache never holds traced values
    return hat, sh


def _monomial_spectrum(plan, c, n: int):
    """Spectrum of X^c for traced c [..., 1] (broadcast over P, N):
    binary exponentiation over the precomputed X^(2^b) tables."""
    tables, tables_sh = _monomial_pow_tables(n, plan.num_primes)
    nb = tables.shape[0]
    p64 = jnp.asarray(plan.p64)
    acc = jnp.ones(c.shape[:-1] + (plan.num_primes, n), dtype=U64)
    for b in range(nb):
        bit = ((c >> b) & 1).astype(bool)[..., None]           # [..., 1, 1]
        mult = mulmod_shoup(acc, jnp.asarray(tables[b]),
                            jnp.asarray(tables_sh[b]), p64)
        acc = jnp.where(bit, mult, acc)
    return acc


def multi_bit_blind_rotate(lut: GlweCiphertext, lwe: LweCiphertext,
                           bsk: NttMultiBitBootstrapKey, log_q: int) -> GlweCiphertext:
    """Blind rotation with grouped mask bits (reference
    multi_bit_deterministic_blind_rotate_assign semantics)."""
    n_poly = bsk.polynomial_size
    g = bsk.grouping_factor
    decomp = bsk.decomp
    glwe_size = bsk.glwe_size
    num_groups = bsk.num_groups
    npr = bsk.data.shape[2]
    plan = get_plan(n_poly, npr)
    batch_shape = lwe.data.shape[:-1]

    switched = modulus_switch(lwe.data, log_q, n_poly)     # [..., n+1]
    a_sw, b_sw = switched[..., :-1], switched[..., -1]
    acc = monomial_mul(
        jnp.broadcast_to(lut.data, batch_shape + lut.data.shape[-2:]),
        (2 * n_poly - b_sw)[..., None])

    subsets = list(itertools.product([0, 1], repeat=g))    # v bit-vectors, MSB first

    def step(j, acc):
        digits = signed_decompose(acc, decomp, log_q)      # [..., k+1, N, l]
        digits = jnp.moveaxis(digits, -1, -3)
        digits = digits.reshape(*digits.shape[:-3], decomp.level * glwe_size, n_poly)
        d_hat = ntt_forward_digits(plan, digits)           # [..., J, P, N]
        d_hat = jnp.moveaxis(d_hat, -2, -3)                # [..., P, J, N]

        a_grp = jax.lax.dynamic_slice_in_dim(a_sw, j * g, g, axis=-1)  # [..., g]
        bsk_j = jax.lax.dynamic_index_in_dim(bsk.data, j, axis=0, keepdims=False)
        sh_j = jax.lax.dynamic_index_in_dim(bsk.shoup, j, axis=0, keepdims=False)

        mac = None
        p64b = jnp.asarray(plan.p64)[:, None, :]
        for v_idx, v in enumerate(subsets):
            c_v = sum((a_grp[..., i] for i in range(g) if v[i]),
                      start=jnp.zeros(batch_shape, jnp.int32)) % (2 * n_poly)
            phase = _monomial_spectrum(plan, c_v[..., None], n_poly)  # [..., P, N]
            d_rot = _mul_spectra(plan, d_hat, phase)
            contrib = _mac(plan, d_rot, bsk_j[v_idx], sh_j[v_idx])
            mac = contrib if mac is None else addmod(mac, contrib, p64b)
        # subtract the identity contribution: GGSW_eff encrypts X^{phase}, and
        # acc_new = GGSW_eff ⊡ acc directly replaces acc
        prod = jnp.moveaxis(mac, -3, -2)                   # [..., R, P, N]
        return garner_to_torus(plan, ntt_inverse(plan, prod), log_q)

    acc = jax.lax.fori_loop(0, num_groups, step, acc)
    return GlweCiphertext(data=acc)


def _mul_spectra(plan, d_hat, phase):
    """d_hat [..., P, J, N] ⊙ phase [..., P, N] mod p (u64 mul + single %)."""
    p64 = jnp.asarray(plan.p64)[:, None, :]
    return (d_hat * phase[..., :, None, :]) % p64


def _mac(plan, d_hat, bsk_v, sh_v):
    """Σ_J d_hat[..., P, J, N] * bsk_v [P, J, R, N] → [..., P, R, N]."""
    p_b = jnp.asarray(plan.p64)[:, None, None, :]
    a = d_hat[..., :, :, None, :]
    prod = mulmod_shoup(a, bsk_v, sh_v, p_b)
    acc = prod[..., 0, :, :]
    for jj in range(1, prod.shape[-3]):
        acc = addmod(acc, prod[..., jj, :, :], jnp.asarray(plan.p64)[:, None, :])
    return acc
