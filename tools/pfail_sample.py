#!/usr/bin/env python
"""p_fail sampling for the KS+PBS atom at a real parameter set
(SURVEY.md §7.2 step 4; reference parameter sets document an error
probability < 2^-40 per PBS, shortint/parameters/mod.rs:596).

Chains `iters` batched KS+PBS executions (output feeds input, so all
`batch * iters` bootstraps are live and any single failure corrupts the
final decode); asserts zero failures and records the sampled bound in
PFAIL.json.  At ~830 PBS/s a 100k-sample run takes ~2 minutes on the chip.

Usage: python tools/pfail_sample.py [--batch 512] [--iters 200]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tfhe_tpu  # noqa: F401,E402 (x64)
import jax
import jax.numpy as jnp
import numpy as np

from tfhe_tpu import shortint
from tfhe_tpu.core.params import shortint_params
from tfhe_tpu.utils.keycache import KeyCache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="PARAM_MESSAGE_2_CARRY_2_KS_PBS")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()
    params = shortint_params(args.params)
    m = params.message_modulus

    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        kc = KeyCache(root=os.path.join(REPO, "keys_cache"))
        ck, sk = kc.get(f"{params.name}_seed1",
                        lambda: shortint.gen_keys(params, seed=1))
        rng = np.random.default_rng(7)
        msgs = rng.integers(0, m, args.batch).astype(np.uint64)
        ct = ck.encrypt(jnp.asarray(msgs), seed=13)
    lut = sk.generate_lookup_table(lambda x: (3 * x + 1) % m)
    if (params.polynomial_size >= 16384
            and getattr(sk.bsk, "paired", None) is not None):
        # 4_4 regime: the full key exceeds chip HBM (OOM observed at 17.8 G
        # vs 15.75 G); ship only the fused kernel's pre-tiled paired form
        sk = sk.replace(bsk=sk.bsk.slim_pretiled())
        print("# slimmed BSK for device transfer", file=sys.stderr)
    sk_dev = jax.device_put(sk, dev)
    lut_dev = jax.device_put(lut, dev)
    data = jax.device_put(ct.lwe.data, dev)

    @jax.jit
    def step(d, key, acc):
        c = ct.with_(lwe=type(ct.lwe)(data=d))
        return key.apply_lookup_table(c, acc).lwe.data

    t0 = time.time()
    cur = step(data, sk_dev, lut_dev)
    np.asarray(cur)
    print(f"# compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    expect = msgs.copy()
    expect = (3 * expect + 1) % m
    t0 = time.time()
    for _ in range(args.iters - 1):
        cur = step(cur, sk_dev, lut_dev)
        expect = (3 * expect + 1) % m
    np.asarray(cur)
    wall = time.time() - t0
    with jax.default_device(cpu):
        dec = np.asarray(ck.decrypt(ct.with_(
            lwe=type(ct.lwe)(data=jax.device_put(cur, cpu)),
            degree=m - 1)))
    mismatches = int((dec != expect).sum())
    total = args.batch * args.iters
    record = {
        "metric": "pbs_pfail_sample",
        "params": params.name,
        "samples": total,
        "mismatching_lanes": mismatches,
        "pfail_bound_if_zero": f"< {3.0 / total:.2e} (95% CL)",
        "documented_bound": "2^-40 per PBS (reference shortint/parameters)",
        "wall_s": round(wall, 1),
    }
    print(json.dumps(record))
    path = os.path.join(REPO, "PFAIL.json")
    try:
        with open(path) as f:
            all_recs = json.load(f)
        if "metric" in all_recs:   # legacy single-record layout
            all_recs = {all_recs["params"]: all_recs}
    except (OSError, ValueError):
        all_recs = {}
    all_recs[params.name] = record
    with open(path, "w") as f:
        json.dump(all_recs, f, indent=1)
    if mismatches:
        sys.exit(1)


if __name__ == "__main__":
    main()
