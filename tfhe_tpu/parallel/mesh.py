"""Device-mesh sharding for batched bootstraps.

The reference's parallelism is shared-memory rayon (SURVEY.md §2.9); the
TPU-native replacement (§5.8) is a `jax.sharding.Mesh` with two axes:

  * ``dp``  — data parallel over the ciphertext batch: independent PBS
    instances are embarrassingly parallel, the north-star workload.
  * ``cp``  — CRT parallel over the NTT prime axis: every prime's butterfly
    network, pointwise MAC and inverse transform are independent; XLA
    inserts one all-gather per external product when Garner reconstruction
    mixes residues.  This shards the NTT-domain bootstrap key P-axis,
    cutting per-chip HBM for key material.

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
    """(in_specs, key_specs, out_specs) for the batched KS+PBS step.

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


def shard_server_key_tree(sk, mesh: Mesh):
    """Place a server-key pytree: BSK P-axis over cp, everything else
    replicated."""
    ct_s, bsk_s, repl = pbs_sharding_specs(mesh)

    def place(path, leaf):
        name = "/".join(str(p) for p in path)
        if hasattr(leaf, "ndim") and leaf.ndim == 5:  # NTT BSK layout
            return jax.device_put(leaf, bsk_s)
        return jax.device_put(leaf, repl)

    return jax.tree_util.tree_map_with_path(place, sk)
