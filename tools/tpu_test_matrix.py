#!/usr/bin/env python
"""Correctness matrix on REAL named parameter sets, run on the attached
accelerator (the analogue of the reference's create_parametrized_test!
matrices, shortint/server_key/tests/shortint.rs:32-121 — those run on real
parameters on big CPU hosts; here the tiny-lattice TEST sets cover CPU CI
and this tool covers the named sets on TPU).

Every op encrypts fresh random inputs, executes jitted on the device, and
decrypts on the host against the clear model.  All ops share the PBS batch
shape so the fused rotation kernel compiles once (the per-op XLA wrappers
still take ~0.5-2 min each through the axon tunnel on first run).

Usage:  python tools/tpu_test_matrix.py [--params NAME] [--batch 256]
Writes TPU_TEST_MATRIX.json at the repo root.
"""
import argparse
import json
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tfhe_tpu  # noqa: F401,E402 (x64)
import jax
import jax.numpy as jnp
import numpy as np

from tfhe_tpu import shortint
from tfhe_tpu.core.params import shortint_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="PARAM_MESSAGE_2_CARRY_2_KS_PBS")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    params = shortint_params(args.params)
    m = params.message_modulus

    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]
    print(f"# params={args.params} batch={args.batch} device={dev}",
          file=sys.stderr)

    t0 = time.time()
    with jax.default_device(cpu):
        from tfhe_tpu.utils.keycache import KeyCache
        kc = KeyCache(root=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "keys_cache"))
        ck, sk = kc.get(f"{params.name}_seed11",
                        lambda: shortint.gen_keys(params, seed=11))
    sk = jax.device_put(sk, dev)
    print(f"# keygen(+cache) {time.time() - t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(5)

    def enc(values, seed):
        with jax.default_device(cpu):
            ct = ck.encrypt(jnp.asarray(values, dtype=jnp.uint64), seed=seed)
        return jax.device_put(ct, dev)

    def dec(ct):
        with jax.default_device(cpu):
            return np.asarray(ck.decrypt(jax.device_put(ct, cpu)))

    # (name, builder(sk, a, b) -> ct, clear(x, y) -> value)
    cases = [
        ("apply_lookup_table",
         lambda sk, a, b: sk.apply_lookup_table(
             a, sk.generate_lookup_table(lambda x: (3 * x + 1) % m)),
         lambda x, y: (3 * x + 1) % m),
        ("add", lambda sk, a, b: sk.add(a, b), lambda x, y: (x + y) % m),
        ("sub", lambda sk, a, b: sk.sub(a, b), lambda x, y: (x - y) % m),
        ("mul_lsb", lambda sk, a, b: sk.mul_lsb(a, b), lambda x, y: (x * y) % m),
        ("bitand", lambda sk, a, b: sk.bitand(a, b), lambda x, y: x & y),
        ("bitxor", lambda sk, a, b: sk.bitxor(a, b), lambda x, y: x ^ y),
        ("greater", lambda sk, a, b: sk.greater(a, b),
         lambda x, y: (x > y).astype(np.uint64)),
        ("scalar_add", lambda sk, a, b: sk.scalar_add(a, 2),
         lambda x, y: (x + 2) % m),
        ("scalar_mul", lambda sk, a, b: sk.scalar_mul(a, 3),
         lambda x, y: (x * 3) % m),
        ("carry_extract",
         lambda sk, a, b: sk.carry_extract(sk.unchecked_add(a, b)),
         lambda x, y: (x + y) // m),
        ("message_extract",
         lambda sk, a, b: sk.message_extract(sk.unchecked_add(a, b)),
         lambda x, y: (x + y) % m),
        ("smart_evaluate_bivariate",
         lambda sk, a, b: sk.smart_evaluate_bivariate(a, b,
                                                      lambda x, y: (x * y + x) % m),
         lambda x, y: (x * y + x) % m),
    ]

    results = {}
    for name, op, clear in cases:
        xs = rng.integers(0, m, size=args.batch)
        ys = rng.integers(0, m, size=args.batch)
        # crc32, not hash(): reproducible across processes (PYTHONHASHSEED)
        case_seed = zlib.crc32(name.encode()) % 2**31
        a = enc(xs, seed=case_seed)
        b = enc(ys, seed=case_seed + 1)
        fn = jax.jit(lambda sk, a, b, _op=op: _op(sk, a, b))
        t0 = time.time()
        out = fn(sk, a, b)
        got = dec(out)
        want = clear(xs, ys)
        ok = bool(np.array_equal(got, want))
        results[name] = ok
        print(f"# {name}: {'PASS' if ok else 'FAIL'} "
              f"({time.time() - t0:.1f}s incl first compile)", file=sys.stderr)
        if not ok:
            bad = np.nonzero(got != want)[0][:5]
            print(f"#   mismatch at {bad}: got {got[bad]} want {want[bad]}",
                  file=sys.stderr)

    summary = {"params": args.params, "batch": args.batch,
               "passed": sum(results.values()), "total": len(results),
               "results": results}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "TPU_TEST_MATRIX.json")
    # merge: one entry per parameter set (the reference's parametrized
    # matrix stamps a test per named set)
    try:
        with open(path) as f:
            all_sets = json.load(f)
        if "results" in all_sets:          # legacy single-set format
            all_sets = {all_sets["params"]: all_sets}
    except (OSError, ValueError):
        all_sets = {}
    all_sets[args.params] = summary
    with open(path, "w") as f:
        json.dump(all_sets, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
