#!/usr/bin/env python
"""p_fail stress for the GGSW-selector shift path (integer/shift_key.py).

Chains `iters` encrypted-amount rotations (output feeds input, so every
iteration's CBS + cmux + refresh pipeline is live and any single decode
failure corrupts the final comparison); asserts zero mismatching blocks
and records the sampled bound in PFAIL_SHIFT.json.  This is the empirical
counterpart of the noise accounting in the shift-key module docstring
(per-PBS p_fail <= 2^-40 with the (4,4) cbs decomposition).

Usage: python tools/pfail_shift.py [--batch 64] [--iters 40]
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

from tfhe_tpu import integer, shortint
from tfhe_tpu.core.entities import LweCiphertext
from tfhe_tpu.core.params import shortint_params
from tfhe_tpu.integer.ciphertext import RadixCiphertext
from tfhe_tpu.integer.client_key import RadixClientKey
from tfhe_tpu.integer.shift_key import new_shift_key
from tfhe_tpu.shortint.ciphertext import Ciphertext as Block
from tfhe_tpu.utils.keycache import KeyCache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="PARAM_MESSAGE_2_CARRY_2_KS_PBS")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--blocks", type=int, default=16)
    args = ap.parse_args()
    params = shortint_params(args.params)
    nb = args.blocks
    width = 2 * nb

    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        kc = KeyCache(root=os.path.join(REPO, "keys_cache"))
        ck, sk = kc.get(f"{params.name}_seed1",
                        lambda: shortint.gen_keys(params, seed=1))
        shk = kc.get(f"{params.name}_shiftkey2_seed1",
                     lambda: new_shift_key(ck, sk, "auto", seed=1))
        rck = RadixClientKey(key=ck, num_blocks=nb)
        rsk = integer.ServerKey(key=sk, shift_key=shk)
        rng = np.random.default_rng(11)
        vals = rng.integers(0, 1 << width, args.batch, dtype=np.uint64)
        amts = rng.integers(0, width, args.batch, dtype=np.uint64)
        v = rck.encrypt(jnp.asarray(vals), seed=21)
        s = rck.encrypt(jnp.asarray(amts), seed=22)
    rsk = jax.device_put(rsk, dev)
    v_data = jax.device_put(jnp.stack([b.lwe.data for b in v.blocks]), dev)
    s_data = jax.device_put(jnp.stack([b.lwe.data for b in s.blocks]), dev)

    def radix_from(data, proto):
        p0 = proto.blocks[0]
        return RadixCiphertext(blocks=[
            Block(lwe=LweCiphertext(data=data[i]),
                  degree=p0.message_modulus - 1,
                  message_modulus=p0.message_modulus,
                  carry_modulus=p0.carry_modulus)
            for i in range(data.shape[0])])

    @jax.jit
    def step(vd, sd, key):
        out = key.rotate_left(radix_from(vd, v), radix_from(sd, s))
        return jnp.stack([b.lwe.data for b in out.blocks])

    t0 = time.time()
    cur = step(v_data, s_data, rsk)
    np.asarray(cur)
    print(f"# compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    mask = np.uint64((1 << width) - 1)
    sh = amts % width

    def rotl(x, r):
        return ((x << r) | ((x & mask) >> (width - r) % width)) & mask

    expect = rotl(vals, sh)
    t0 = time.time()
    for _ in range(args.iters - 1):
        cur = step(cur, s_data, rsk)
        expect = rotl(expect, sh)
    np.asarray(cur)
    wall = time.time() - t0
    with jax.default_device(cpu):
        dec = np.asarray(rck.decrypt(radix_from(
            jax.device_put(cur, cpu), v))).astype(np.uint64)
    bad_ops = int((dec != expect).sum())
    total_blocks = args.batch * args.iters * nb
    record = {
        "metric": "ggsw_shift_pfail_sample",
        "params": params.name,
        "rotations": args.batch * args.iters,
        "live_block_outputs": total_blocks,
        "mismatching_values": bad_ops,
        "pfail_bound_if_zero": f"< {3.0 / total_blocks:.2e} per block (95% CL)",
        "wall_s": round(wall, 1),
    }
    print(json.dumps(record))
    path = os.path.join(REPO, "PFAIL_SHIFT.json")
    try:
        with open(path) as f:
            all_recs = json.load(f)
        if "metric" in all_recs:          # migrate the old single-record form
            all_recs = {f"blocks16": all_recs}
    except (OSError, ValueError):
        all_recs = {}
    all_recs[f"blocks{nb}"] = record
    with open(path, "w") as f:
        json.dump(all_recs, f, indent=1)
    if bad_ops:
        sys.exit(1)


if __name__ == "__main__":
    main()
