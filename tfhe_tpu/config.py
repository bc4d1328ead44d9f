"""Runtime configuration switches (the analogue of the reference's cargo
feature switchboard, SURVEY.md §5.6)."""
from __future__ import annotations

import os
from typing import Optional

_USE_PALLAS: Optional[bool] = None


def use_pallas_pbs() -> bool:
    """Whether the fused Pallas blind-rotation kernel drives the PBS.
    Defaults to True on TPU backends, False elsewhere (the XLA path is the
    portable reference implementation).  Override with set_use_pallas_pbs or
    TFHE_TPU_USE_PALLAS=0/1."""
    global _USE_PALLAS
    if _USE_PALLAS is None:
        env = os.environ.get("TFHE_TPU_USE_PALLAS")
        if env is not None:
            _USE_PALLAS = env not in ("0", "false", "False")
        else:
            import jax
            _USE_PALLAS = jax.default_backend() not in ("cpu",)
    return _USE_PALLAS


def set_use_pallas_pbs(flag: bool):
    global _USE_PALLAS
    _USE_PALLAS = bool(flag)


_PALLAS_INTERPRET: Optional[bool] = None


def pallas_interpret() -> bool:
    """Run Pallas kernels in interpret mode (CPU emulation of the Mosaic
    kernel).  Lets the real kernel path — not just the XLA fallback — be
    exercised on the virtual CPU mesh in sharding tests.  Default False.
    Override with set_pallas_interpret or TFHE_TPU_PALLAS_INTERPRET=0/1."""
    global _PALLAS_INTERPRET
    if _PALLAS_INTERPRET is None:
        env = os.environ.get("TFHE_TPU_PALLAS_INTERPRET")
        _PALLAS_INTERPRET = (env not in ("0", "false", "False")
                             if env is not None else False)
    return _PALLAS_INTERPRET


def set_pallas_interpret(flag: bool):
    global _PALLAS_INTERPRET
    _PALLAS_INTERPRET = bool(flag)


_USE_MXU: Optional[bool] = None


def use_mxu_ntt() -> bool:
    """Whether the Pallas kernel runs its NTTs on the MXU (four-step int8
    matmul factorization, poly/fourstep.py) instead of VPU butterflies.
    Decides the spectral ordering of NTT bootstrap keys at conversion time;
    execution follows the ordering recorded on the key.  Override with
    set_use_mxu_ntt or TFHE_TPU_MXU=0/1."""
    global _USE_MXU
    if _USE_MXU is None:
        env = os.environ.get("TFHE_TPU_MXU")
        _USE_MXU = env not in ("0", "false", "False") if env is not None else True
    return _USE_MXU


def set_use_mxu_ntt(flag: bool):
    global _USE_MXU
    _USE_MXU = bool(flag)


_MXU_LANES: Optional[bool] = None


def use_mxu_lanes() -> bool:
    """Whether the MXU kernel uses the "lanes" layout (batch folded into the
    lane dimension; dense prime-paired stage-A matmuls with no block-diagonal
    batch embedding) instead of the "rows" layout.  Decides the spectral/
    phase-table layout recorded on NTT bootstrap keys at conversion time;
    execution follows the key.  Override with set_use_mxu_lanes or
    TFHE_TPU_MXU_LANES=0/1."""
    global _MXU_LANES
    if _MXU_LANES is None:
        env = os.environ.get("TFHE_TPU_MXU_LANES")
        _MXU_LANES = env not in ("0", "false", "False") if env is not None else False
    return _MXU_LANES


def set_use_mxu_lanes(flag: bool):
    global _MXU_LANES
    _MXU_LANES = bool(flag)


_FUSED_ROTATION: Optional[bool] = None


def use_fused_rotation() -> bool:
    """Whether the MXU path runs the WHOLE blind rotation as one Pallas
    kernel (grid = batch tiles x steps): accumulator resident in VMEM,
    BSK slices double-buffered from HBM by the pipeline, phase rows DMA'd
    in-kernel.  Requires the 'fourstep' (rows) key order.  Default ON
    (TPU-verified faster than the per-step kernel in both delta and
    multibit modes: 668 vs 643 classic, 830 vs 760 GROUP_3 PBS/s).
    Override with set_use_fused_rotation or TFHE_TPU_FUSED=0/1."""
    global _FUSED_ROTATION
    if _FUSED_ROTATION is None:
        env = os.environ.get("TFHE_TPU_FUSED")
        _FUSED_ROTATION = env not in ("0", "false", "False") if env is not None else True
    return _FUSED_ROTATION


def set_use_fused_rotation(flag: bool):
    global _FUSED_ROTATION
    _FUSED_ROTATION = bool(flag)


_BATCH_BUCKETS: Optional[bool] = None


def bucket_pbs_batch() -> bool:
    """Whether Pallas blind-rotation wrappers round the flat batch up into a
    small geometric bucket set ({2^k, 3*2^{k-1}} above 4 kernel tiles) so
    distinct logical batch sizes share compiled kernels.  Each distinct
    padded batch is a separate multi-minute TPU compile through the remote
    tunnel, and integer-layer ops stack *varying* block counts onto the PBS
    batch axis — without bucketing a single FheUint mul triggers a fresh
    compile per carry-scan layer.  Padding overhead is bounded at 1.5x.
    Override with set_bucket_pbs_batch or TFHE_TPU_BATCH_BUCKETS=0/1."""
    global _BATCH_BUCKETS
    if _BATCH_BUCKETS is None:
        env = os.environ.get("TFHE_TPU_BATCH_BUCKETS")
        _BATCH_BUCKETS = (env not in ("0", "false", "False")
                          if env is not None else True)
    return _BATCH_BUCKETS


def set_bucket_pbs_batch(flag: bool):
    global _BATCH_BUCKETS
    _BATCH_BUCKETS = bool(flag)
