#!/usr/bin/env python
"""Per-stage cost profile of the fused whole-rotation Pallas kernel.

Runs blind_rotate_fused on SYNTHETIC key material (random residues < p with
consistent Shoup twins — pure timing, results are not decrypted) once per
ablation set, and reports the time delta each stage contributes.  Stages:
decomp, fwd (forward NTT), phase (monomial phase DMA+multiply), mac,
inv (inverse NTT), garner.

Usage:  python tools/ablate_kernel.py [--batch 512] [--iters 3]
            [--params PARAM_MESSAGE_2_CARRY_2_KS_PBS] [--stages full,...]

Each variant is a fresh TPU compile (~5-13 min through the axon tunnel the
first time; the persistent compile cache makes reruns instant).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tfhe_tpu  # noqa: F401,E402 (x64)
import jax
import jax.numpy as jnp

from tfhe_tpu.core.params import shortint_params, DecompParams
from tfhe_tpu.core.algorithms.bootstrap import external_product_num_primes
from tfhe_tpu.core.poly.ntt import get_plan
from tfhe_tpu.core.poly import fourstep as fs
from tfhe_tpu.core.poly.pallas_ntt import blind_rotate_fused

LOG_Q = 64

VARIANTS = [
    ("full", frozenset()),
    ("no_garner", frozenset({"garner"})),
    ("no_mac", frozenset({"mac"})),
    ("no_phase", frozenset({"phase"})),
    ("no_fwd", frozenset({"fwd"})),
    ("no_inv", frozenset({"inv"})),
    ("no_gcombine", frozenset({"gcombine"})),
    ("no_gdigits", frozenset({"gdigits"})),
    ("floor", frozenset({"decomp", "fwd", "phase", "mac", "inv", "garner"})),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--params", default="PARAM_MESSAGE_2_CARRY_2_KS_PBS")
    ap.add_argument("--stages", default=None,
                    help="comma list of variant names to run (default: all)")
    args = ap.parse_args()

    params = shortint_params(args.params)
    n = params.polynomial_size
    R = params.glwe_dimension + 1
    n_in = params.lwe_dimension
    decomp = DecompParams(base_log=params.pbs_base_log, level=params.pbs_level)
    P = external_product_num_primes(n, R, decomp, LOG_Q)
    J = decomp.level * R
    plan = get_plan(n, P)
    primes = np.array([int(p) for p in plan.primes], dtype=np.uint64)

    rng = np.random.default_rng(0)
    # synthetic GGSW spectra: [n_in, P, J, R, N] u32 residues < p + Shoup twin
    vals = rng.integers(0, primes[None, :, None, None, None],
                        size=(n_in, P, J, R, n), dtype=np.uint64)
    sh = (vals << np.uint64(32)) // primes[None, :, None, None, None]
    bsk_u32 = jnp.asarray(vals.astype(np.uint32))
    bsk_sh = jnp.asarray(sh.astype(np.uint32))
    tab, tab_sh = fs.monomial_full_tables(n, P, True)
    mono, mono_sh = jnp.asarray(tab), jnp.asarray(tab_sh)
    lut = jnp.asarray(rng.integers(0, 1 << 63, size=(R, n), dtype=np.uint64))
    lwe = jnp.asarray(rng.integers(0, 1 << 63, size=(args.batch, n_in + 1),
                                   dtype=np.uint64))

    dev = jax.devices()[0]
    print(f"# device {dev}; P={P} J={J} R={R} n={n} n_in={n_in}",
          file=sys.stderr)
    bsk_u32, bsk_sh = jax.device_put(bsk_u32, dev), jax.device_put(bsk_sh, dev)
    mono, mono_sh = jax.device_put(mono, dev), jax.device_put(mono_sh, dev)
    lut, lwe = jax.device_put(lut, dev), jax.device_put(lwe, dev)

    want = args.stages.split(",") if args.stages else None
    results = {}
    for name, abl in VARIANTS:
        if want and name not in want:
            continue

        # NB: key material must be jit ARGUMENTS — closure constants get
        # inlined into the compile payload (HTTP 413 through the tunnel)
        @jax.jit
        def run(lwe_in, bsk_a, bsk_s, mono_a, mono_s, _abl=abl):
            return blind_rotate_fused(lut, lwe_in, bsk_a, bsk_s, mono_a,
                                      mono_s, decomp, log_q=LOG_Q,
                                      mode="delta", ablate=_abl)

        t0 = time.time()
        out = run(lwe, bsk_u32, bsk_sh, mono, mono_sh)
        np.asarray(out)
        print(f"# {name}: compile+run {time.time() - t0:.1f}s", file=sys.stderr)
        # chain: fold rotation output back into the lwe input (uncacheable)
        cur = lwe + out[:, 0, :n_in + 1].astype(jnp.uint64)
        t0 = time.time()
        for _ in range(args.iters):
            out = run(cur, bsk_u32, bsk_sh, mono, mono_sh)
            cur = lwe + out[:, 0, :n_in + 1].astype(jnp.uint64)
        np.asarray(cur)
        dt = (time.time() - t0) / args.iters
        results[name] = dt
        print(f"# {name}: {dt*1000:.1f} ms/rotation-batch", file=sys.stderr)

    if "full" in results:
        full = results["full"]
        floor = results.get("floor", 0.0)
        deltas = {}
        for name, dt in results.items():
            if name.startswith("no_"):
                deltas[name[3:]] = round((full - dt) * 1000, 1)
        print(json.dumps({
            "full_ms": round(full * 1000, 1),
            "floor_ms": round(floor * 1000, 1),
            "stage_delta_ms": deltas,
            "batch": args.batch,
        }))
    else:
        print(json.dumps({k: round(v * 1000, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
