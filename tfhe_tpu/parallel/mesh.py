"""Device-mesh sharding for batched bootstraps.

The reference's parallelism is shared-memory rayon (SURVEY.md §2.9); the
TPU-native replacement (§5.8) is a `jax.sharding.Mesh` with two axes:

  * ``dp``  — data parallel over the ciphertext batch: independent PBS
    instances are embarrassingly parallel, the north-star workload.
    Production path: `shard_map_kspbs` wraps the whole batched KS+PBS step
    in `jax.shard_map` over dp with the key material replicated — each chip
    runs the full fused Pallas kernel on its batch shard with zero
    collectives, so throughput scales linearly in chips.
  * ``cp``  — CRT parallel over the NTT prime axis: every prime's butterfly
    network, pointwise MAC and inverse transform are independent; XLA
    inserts one all-gather per external product when Garner reconstruction
    mixes residues.  This shards the NTT-domain bootstrap key P-axis,
    cutting per-chip HBM for key material (XLA path only — a Pallas call
    cannot be auto-partitioned, so cp applies to the portable fallback).

Shardings are expressed as `NamedSharding` annotations on the existing
batched kernels — XLA's SPMD partitioner inserts the collectives (no
NCCL-style explicit communication, per the design brief).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, cp: int = 1,
              devices=None) -> Mesh:
    """Mesh with shape (dp = n/cp, cp)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % cp == 0, f"{n} devices not divisible by cp={cp}"
    arr = np.asarray(devices).reshape(n // cp, cp)
    return Mesh(arr, ("dp", "cp"))


def pbs_sharding_specs(mesh: Mesh):
    """(ct_sharding, bsk_sharding, replicated) for the batched KS+PBS step.

    Ciphertext batch [B, n+1]      → P('dp', None)
    NTT BSK [n, P, J, R, N]        → P(None, 'cp', None, None, None)
    KSK [n_in, l, n_out+1]         → replicated
    LUT accumulator [k+1, N]       → replicated
    """
    ct = NamedSharding(mesh, P("dp"))
    bsk = NamedSharding(mesh, P(None, "cp"))
    repl = NamedSharding(mesh, P())
    return ct, bsk, repl


def shard_lwe_batch(data, mesh: Mesh):
    """Place a [..., n+1] ciphertext batch with the batch axis over dp."""
    spec = P(*(("dp",) + (None,) * (data.ndim - 1)))
    return jax.device_put(data, NamedSharding(mesh, spec))


# For each bootstrap-key array field, where its CRT-prime axis sits, keyed by
# (field name, ndim).  Layouts (core/entities.py, core/algorithms/multi_bit.py):
#   NttLweBootstrapKey.data/.shoup            [n, P, J, R, N]          → axis 1
#   NttLweBootstrapKey.paired/.paired_shoup   'fourstep': [n,P,J,R,N]  → axis 1
#                                             'dif': [n,2,P,J,R,N]     → axis 2
#   NttLweBootstrapKey.mono/.mono_shoup       [2N, P, N1, N2]          → axis 1
#   NttMultiBitBootstrapKey.data/.shoup and .data_u32/.shoup_u32
#                                             [n/g, 2^g, P, J, R, N]   → axis 2
_BSK_PRIME_AXIS = {
    ("data", 5): 1, ("shoup", 5): 1,
    ("data", 6): 2, ("shoup", 6): 2,
    ("paired", 5): 1, ("paired_shoup", 5): 1,
    ("paired", 6): 2, ("paired_shoup", 6): 2,
    ("mono", 4): 1, ("mono_shoup", 4): 1,
    ("data_u32", 6): 2, ("shoup_u32", 6): 2,
}


def _leaf_field_name(path) -> str:
    """Last attribute name on a tree path ('' if none)."""
    for entry in reversed(path):
        name = getattr(entry, "name", None)
        if name is not None:
            return str(name)
    return ""


def shard_server_key_tree(sk, mesh: Mesh):
    """Place a server-key pytree: every bootstrap-key array's CRT-prime axis
    over cp (when divisible), everything else (KSK, secret-free metadata)
    replicated.  Field-name + ndim keyed so the `paired`/`mono` layouts the
    fused kernel consumes are covered, not just the 5-dim XLA-path array."""
    repl = NamedSharding(mesh, P())
    cp = mesh.shape.get("cp", 1)

    def place(path, leaf):
        if not hasattr(leaf, "ndim"):
            return leaf
        axis = _BSK_PRIME_AXIS.get((_leaf_field_name(path), leaf.ndim))
        if axis is not None and cp > 1 and leaf.shape[axis] % cp == 0:
            spec = P(*(None,) * axis, "cp")
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, repl)

    return jax.tree_util.tree_map_with_path(place, sk)


def shard_map_kspbs(step, mesh: Mesh, batch_axis: str = "dp"):
    """Wrap a batched `(ct_data, server_key, lut) -> out_data` step in
    `jax.shard_map`: batch split over `batch_axis`, key material replicated.

    This is the production multi-chip path (SURVEY.md §5.8 north-star
    workload): independent bootstraps are embarrassingly parallel, each
    device runs the complete fused Pallas kernel (or the XLA fallback) on
    its local batch shard, and no collectives are emitted.  The caller jits
    the returned function; the local batch must divide by the mesh axis.
    """
    return jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(batch_axis), P(), P()),
        out_specs=P(batch_axis),
        check_vma=False)


def replicate_tree(tree, mesh: Mesh):
    """Place every array leaf of a pytree replicated on the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, repl)
        if hasattr(leaf, "ndim") else leaf, tree)
