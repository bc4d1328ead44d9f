#!/usr/bin/env python
"""Extended headline benchmarks vs the reference's published numbers
(BASELINE.md / reference docs/getting_started/benchmarks.md): boolean
gates, shortint ops, and HLAPI FheUint32 ops, all decryption-verified and
amortized over a batch (the TPU-native unit of work — reference numbers
are single-op latency on a 128-core m6i.metal with rayon fan-out).

Usage:  python tools/bench_suite.py --op boolean_gate [--batch 512]
        python tools/bench_suite.py --op uint32_mul --batch 32
Ops: boolean_gate shortint_add uint32_add uint32_mul uint32_bitand uint32_eq

Each run prints one JSON line {metric, value(ms/op amortized), unit,
vs_baseline(speedup)} and merges it into BENCH_SUITE.json at the repo root.
First compile through the axon tunnel is slow (minutes, cached after);
run detached.
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

from tfhe_tpu import boolean, integer, shortint
from tfhe_tpu.integer.ciphertext import RadixCiphertext
from tfhe_tpu.shortint.ciphertext import Ciphertext as ShortCt
from tfhe_tpu.core.entities import LweCiphertext

# reference single-op latency, ms (BASELINE.md; m6i.metal, AVX-512, rayon)
BASELINES_MS = {
    "boolean_gate": 9.19,       # AND, DEFAULT_PARAMETERS_KS_PBS
    "shortint_add": 17.0,       # 2_2, default flavor
    "uint32_add": 132.0,
    "uint32_mul": 333.0,
    "uint32_bitand": 21.0,
    "uint32_eq": 57.4,
    "uint32_gt": 98.8,          # Cmp row
    "uint32_max": 135.0,
    "uint32_neg": 129.0,
    "uint32_shl": 180.0,        # shift by encrypted amount
    "uint32_rotl": 182.0,       # rotate by encrypted amount
    "uint32_div": 4810.0,       # div_rem
    "uint8_div": 729.0,         # div_rem at 8 bits (4 blocks)
    "uint16_div": 1930.0,       # div_rem at 16 bits (8 blocks)
    "uint8_mul": 144.0,         # benchmarks.md:17 FheUint8 row
    "uint64_add": 186.0,        # benchmarks.md:16 FheUint64 row
    "uint64_mul": 832.0,        # benchmarks.md:16 FheUint64 rows
    "uint64_div": 12200.0,
    "uint64_shl": 243.0,
    # the reference repo ships trivium as criterion benches with no
    # published table; the record carries bits/s + a PBS/s-equivalent rate
    # comparable to the 60.2 PBS/s/core headline yardstick instead
    "trivium_keystream": None,
}


def _time_chained(fn, args0, chain, iters, verify, groups=2):
    """Compile+run once (verified), then time `groups` groups of `iters`
    chained executions and report the BEST group.  `chain(args, out) -> args`
    must make every iteration a fresh execution (the axon relay caches
    repeated identical requests).  Best-of-groups defends against transient
    pool contention: the round-5 uint64_shl run recorded 3239 ms/op in a
    contended window where the same program reproduces 122 ms/op."""
    t0 = time.time()
    out = fn(*args0)
    jax.tree.map(np.asarray, out)   # block_until_ready lies through the tunnel
    print(f"# first call (compile+run): {time.time() - t0:.1f}s",
          file=sys.stderr)
    ok = verify(out)
    args = chain(args0, out)
    times = []
    for _ in range(groups):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
            args = chain(args, out)
        jax.tree.map(np.asarray, out)
        times.append((time.time() - t0) / iters)
    print(f"# group times/iter: {[f'{t:.3f}' for t in times]}",
          file=sys.stderr)
    return min(times), ok


def _stack(ct: RadixCiphertext):
    return jnp.stack([b.lwe.data for b in ct.blocks])


def _radix_from(data, proto: RadixCiphertext):
    p0 = proto.blocks[0]
    return RadixCiphertext(blocks=[
        ShortCt(lwe=LweCiphertext(data=data[i]),
                degree=p0.message_modulus - 1,
                message_modulus=p0.message_modulus,
                carry_modulus=p0.carry_modulus)
        for i in range(data.shape[0])])


def bench_boolean_gate(batch, iters, params="DEFAULT_PARAMETERS_KS_PBS"):
    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        if isinstance(params, str):
            from tfhe_tpu.utils.keycache import KeyCache
            kc = KeyCache(root=os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "keys_cache"))
            ck, sk = kc.get(f"boolean_{params}_seed1",
                            lambda: boolean.gen_keys(params, seed=1))
        else:
            ck, sk = boolean.gen_keys(params, seed=1)
        rng = np.random.default_rng(0)
        a_clear = rng.integers(0, 2, batch).astype(bool)
        b_clear = rng.integers(0, 2, batch).astype(bool)
        a = boolean.encrypt(ck, jnp.asarray(a_clear), seed=2)
        b = boolean.encrypt(ck, jnp.asarray(b_clear), seed=3)
    sk = jax.device_put(sk, dev)
    a_data = jax.device_put(a.lwe.data, dev)
    b_data = jax.device_put(b.lwe.data, dev)

    @jax.jit
    def gate(ad, bd, key):
        ca = type(a)(lwe=LweCiphertext(data=ad))
        cb = type(b)(lwe=LweCiphertext(data=bd))
        return boolean.and_(key, ca, cb).lwe.data

    def verify(out):
        with jax.default_device(cpu):
            dec = np.asarray(boolean.decrypt(
                ck, type(a)(lwe=LweCiphertext(data=jax.device_put(out, cpu)))))
        return bool(np.array_equal(dec, a_clear & b_clear))

    dt, ok = _time_chained(lambda ad, bd: gate(ad, bd, sk), (a_data, b_data),
                           lambda args, out: (out, args[0]), iters, verify)
    return dt * 1000 / batch, ok, {"params": str(params), "batch": batch}


def bench_shortint_add(batch, iters, params="PARAM_MESSAGE_2_CARRY_2_KS_PBS"):
    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        if isinstance(params, str):
            from tfhe_tpu.utils.keycache import KeyCache
            kc = KeyCache(root=os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "keys_cache"))
            ck, sk = kc.get(f"{params}_seed1",
                            lambda: shortint.gen_keys(params, seed=1))
        else:
            ck, sk = shortint.gen_keys(params, seed=1)
        m = ck.params.message_modulus
        a_clear = np.arange(batch) % m
        b_clear = (np.arange(batch) * 3 + 1) % m
        a = ck.encrypt(jnp.asarray(a_clear, dtype=jnp.uint64), seed=2)
        b = ck.encrypt(jnp.asarray(b_clear, dtype=jnp.uint64), seed=3)
    sk = jax.device_put(sk, dev)
    a_data = jax.device_put(a.lwe.data, dev)
    b_data = jax.device_put(b.lwe.data, dev)

    @jax.jit
    def add(ad, bd, key):
        ca = a.with_(lwe=LweCiphertext(data=ad))
        cb = b.with_(lwe=LweCiphertext(data=bd))
        return key.add(ca, cb).lwe.data

    def verify(out):
        with jax.default_device(cpu):
            dec = np.asarray(ck.decrypt(a.with_(
                lwe=LweCiphertext(data=jax.device_put(out, cpu)), degree=m - 1)))
        return bool(np.array_equal(dec, (a_clear + b_clear) % m))

    dt, ok = _time_chained(lambda ad, bd: add(ad, bd, sk), (a_data, b_data),
                           lambda args, out: (out, args[0]), iters, verify)
    return dt * 1000 / batch, ok, {"params": str(params), "batch": batch}


def _cached_integer_keys(params, nb, with_shift=False):
    """Disk key cache (reference keycache test fixture): integer keys share
    the shortint cache entry bench.py populates.  with_shift adds the
    GGSW-selector shift key (its own cache entry)."""
    if not isinstance(params, str):
        shift = None
        if with_shift:
            from tfhe_tpu.core.params import TEST_PARAMS_WOPBS
            shift = TEST_PARAMS_WOPBS
        return integer.gen_keys(params, num_blocks=nb, seed=1, shift_key=shift)
    from tfhe_tpu.integer.client_key import RadixClientKey
    from tfhe_tpu.utils.keycache import KeyCache
    kc = KeyCache(root=os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "keys_cache"))
    ck, sk = kc.get(f"{params}_seed1",
                    lambda: shortint.gen_keys(params, seed=1))
    shk = None
    if with_shift:
        from tfhe_tpu.integer.shift_key import new_shift_key
        shk = kc.get(f"{params}_shiftkey2_seed1",
                     lambda: new_shift_key(ck, sk, "auto", seed=1))
    return (RadixClientKey(key=ck, num_blocks=nb),
            integer.ServerKey(key=sk, shift_key=shk))


def bench_trivium(batch, iters, params="PARAM_MESSAGE_1_CARRY_2_KS_PBS"):
    """Batched Trivium keystream throughput (reference apps/trivium
    benches/trivium_shortint.rs): `batch` independent streams ride every
    cell's batch axis, one 64-bit round = 4 stacked PBS calls of
    192*batch / 64*batch; verified against the eSTREAM clear model."""
    from tfhe_tpu.apps.trivium import (TriviumStreamShortint,
                                       clear_trivium_keystream)
    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]
    S = batch
    rng = np.random.default_rng(7)
    keys_clear = rng.integers(0, 2, (80, S)).astype(np.uint64)
    iv_bits = rng.integers(0, 2, 80).astype(int).tolist()
    with jax.default_device(cpu):
        if isinstance(params, str):
            from tfhe_tpu.utils.keycache import KeyCache
            kc = KeyCache(root=os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "keys_cache"))
            ck, sk = kc.get(f"{params}_seed1",
                            lambda: shortint.gen_keys(params, seed=1))
        else:
            ck, sk = shortint.gen_keys(params, seed=1)
        enc_key = [ck.encrypt(jnp.asarray(keys_clear[i]), seed=20 + i)
                   for i in range(80)]
        stream = TriviumStreamShortint(enc_key, iv_bits, sk, warmup_rounds=0)

        def bcast(cells):
            out = []
            for cell in cells:
                d = cell.lwe.data
                if d.ndim == 1:   # trivial scalar cell -> batch of S
                    d = jnp.broadcast_to(d, (S,) + d.shape)
                out.append(cell.with_(lwe=LweCiphertext(data=d)))
            return out
        a0, b0, c0 = bcast(stream.a), bcast(stream.b), bcast(stream.c)
        proto = [list(a0), list(b0), list(c0)]
        pack = lambda cells: jnp.stack([cl.lwe.data for cl in cells])
    sk_dev = jax.device_put(sk, dev)
    state0 = tuple(jax.device_put(pack(r), dev) for r in (a0, b0, c0))

    @jax.jit
    def step(ad, bd, cd, key):
        regs = []
        for data, ref in zip((ad, bd, cd), proto):
            regs.append([cell.with_(lwe=LweCiphertext(data=data[i]))
                         for i, cell in enumerate(ref)])
        na, nb, nc, out = TriviumStreamShortint.step_64(key, *regs)
        return (jnp.stack([cl.lwe.data for cl in na]),
                jnp.stack([cl.lwe.data for cl in nb]),
                jnp.stack([cl.lwe.data for cl in nc]),
                jnp.stack([cl.lwe.data for cl in out]))

    # compile + Trivium's 1152-clock warmup = 18 rounds, chained on device
    t0 = time.time()
    st = state0
    for r in range(18):
        *st, _ = step(*st, sk_dev)
        st = tuple(st)
        if r == 0:
            jax.tree.map(np.asarray, st)
            print(f"# first call (compile+run): {time.time() - t0:.1f}s",
                  file=sys.stderr)
    *st1, out = step(*st, sk_dev)
    np.asarray(out[0])

    # verify round 19 output = keystream bits [0, 64) for every stream
    with jax.default_device(cpu):
        host = jax.device_put(out, cpu)
        outs = [stream.a[0].with_(lwe=LweCiphertext(data=host[i]))
                for i in range(64)]
        got = np.stack([np.asarray(ck.decrypt(o)) & 1 for o in outs])  # [64,S]
    ok = True
    for s in range(S):
        expect = clear_trivium_keystream(
            [int(x) for x in keys_clear[:, s]], iv_bits, 64)
        ok = ok and bool(np.array_equal(got[:, s], np.asarray(expect)))

    # timed chained rounds
    st = tuple(st1)
    t0 = time.time()
    for _ in range(iters):
        *st, out = step(*st, sk_dev)
        st = tuple(st)
    np.asarray(out[0])
    dt = (time.time() - t0) / iters
    bits_per_s = 64 * S / dt
    pbs_per_round = 448 * S          # 192 bitand + 192 extract + 64 output
    return dt * 1000, ok, {"params": str(params), "streams": S,
                           "bits_per_s": round(bits_per_s, 1),
                           "pbs_equiv_per_s": round(pbs_per_round / dt, 1)}


def bench_uint32(op, batch, iters, params="PARAM_MESSAGE_2_CARRY_2_KS_PBS"):
    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]
    nb = {"uint8": 4, "uint16": 8, "uint64": 32}.get(op.split("_")[0], 16)
    width = nb * 2
    with jax.default_device(cpu):
        rck, rsk = _cached_integer_keys(
            params, nb,
            with_shift=op.endswith(("_shl", "_rotl")))
        rng = np.random.default_rng(0)
        a_clear = rng.integers(0, 1 << width, batch, dtype=np.uint64)
        if op.endswith(("_shl", "_rotl")):
            b_clear = rng.integers(0, width, batch, dtype=np.uint64)
        elif op.endswith("_div"):
            b_clear = rng.integers(1, 1 << width, batch, dtype=np.uint64)
        else:
            b_clear = rng.integers(0, 1 << width, batch, dtype=np.uint64)
        a = rck.encrypt(jnp.asarray(a_clear), seed=2)
        b = rck.encrypt(jnp.asarray(b_clear), seed=3)
    rsk = jax.device_put(rsk, dev)
    a_data = jax.device_put(_stack(a), dev)
    b_data = jax.device_put(_stack(b), dev)
    mask = np.uint64((1 << width) - 1)
    clear_fn = {
        "uint32_add": lambda x, y: (x + y) & mask,
        "uint64_add": lambda x, y: (x + y) & mask,
        "uint8_mul": lambda x, y: (x * y) & mask,
        "uint32_mul": lambda x, y: (x * y) & mask,
        "uint32_bitand": lambda x, y: x & y,
        "uint32_eq": lambda x, y: (x == y).astype(np.uint64),
        "uint32_gt": lambda x, y: (x > y).astype(np.uint64),
        "uint32_max": np.maximum,
        "uint32_neg": lambda x, y: (-(x.astype(np.int64))).astype(
            np.uint64) & mask,
        "uint32_shl": lambda x, y: (x << (y % 32)) & mask,
        "uint32_rotl": lambda x, y: ((x << (y % 32)) | (
            (x & mask) >> (32 - (y % 32)) % 32)) & mask,
        "uint32_div": lambda x, y: x // y,
        "uint8_div": lambda x, y: x // y,
        "uint16_div": lambda x, y: x // y,
        "uint64_mul": lambda x, y: x * y,
        "uint64_div": lambda x, y: x // y,
        "uint64_shl": lambda x, y: (x << (y % np.uint64(64))) & mask,
    }[op]

    @jax.jit
    def run(ad, bd, key):
        ca = _radix_from(ad, a)
        cb = _radix_from(bd, b)
        if op.endswith("_add"):
            # sequential ripple (reference full_propagate), NOT the
            # Hillis-Steele scan: on throughput-bound hardware the scan's
            # n·log n PBS (112/add) loses to the ripple's 2n (32/add); the
            # batch axis keeps every ripple step a full PBS batch anyway
            # (the scan remains the right choice for single-op latency —
            # reference add_parallelized vs *_work_efficient tradeoff)
            return _stack(key.add(ca, cb))
        if op in ("uint32_mul", "uint8_mul", "uint64_mul"):
            return _stack(key.mul(ca, cb))
        if op == "uint32_bitand":
            return _stack(key.bitand(ca, cb))
        if op == "uint32_gt":
            return jnp.stack([key.gt(ca, cb).block.lwe.data])
        if op == "uint32_max":
            return _stack(key.max(ca, cb))
        if op == "uint32_neg":
            return _stack(key.neg(ca))
        if op.endswith("_shl"):
            return _stack(key.left_shift(ca, cb))
        if op == "uint32_rotl":
            return _stack(key.rotate_left(ca, cb))
        if op.endswith("_div"):
            return _stack(key.div(ca, cb))
        return jnp.stack([key.eq(ca, cb).block.lwe.data])

    def verify(out):
        with jax.default_device(cpu):
            host = jax.device_put(out, cpu)
            if op in ("uint32_eq", "uint32_gt"):
                blk = ShortCt(lwe=LweCiphertext(data=host[0]), degree=1,
                              message_modulus=4, carry_modulus=4)
                dec = np.asarray(rck.key.decrypt(blk)) & 1
            else:
                dec = np.asarray(rck.decrypt(_radix_from(host, a)))
        return bool(np.array_equal(dec.astype(np.uint64),
                                   clear_fn(a_clear, b_clear)))

    def chain(args, out):
        ad, bd = args
        return (ad + out[0][None], bd)   # perturb: fresh execution each iter

    dt, ok = _time_chained(lambda ad, bd: run(ad, bd, rsk), (a_data, b_data),
                           chain, iters, verify)
    return dt * 1000 / batch, ok, {"params": str(params),
                                   "batch": batch, "num_blocks": nb}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", required=True, choices=sorted(BASELINES_MS))
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--test-params", action="store_true",
                    help="tiny insecure sets + CPU (harness smoke test)")
    ap.add_argument("--multibit", action="store_true",
                    help="use PARAM_MULTI_BIT_MESSAGE_2_CARRY_2_GROUP_3_KS_PBS "
                         "(the faster bootstrap key; metric suffixed _mb)")
    args = ap.parse_args()
    batch = args.batch or (512 if args.op in ("boolean_gate", "shortint_add")
                           else 256 if args.op == "uint32_add"   # ripple:
                           else 8 if args.op == "uint32_div"     # huge op
                           else 64 if args.op == "uint8_div"
                           else 16 if args.op == "uint16_div"
                           else 4 if args.op in ("uint64_div", "trivium_keystream")
                           else 16 if args.op in ("uint64_mul", "uint64_shl")
                           else 32)   # 2 luts x 256 ops = one full PBS batch

    t0 = time.time()
    kw = {}
    if args.test_params:
        from tfhe_tpu.core.params import (TEST_PARAMS_BOOLEAN,
                                          TEST_PARAMS_SHORTINT)
        if args.op == "trivium_keystream":
            from tfhe_tpu.core.params import TEST_PARAMS_TRIVIUM
            kw["params"] = TEST_PARAMS_TRIVIUM
        else:
            kw["params"] = (TEST_PARAMS_BOOLEAN if args.op == "boolean_gate"
                            else TEST_PARAMS_SHORTINT)
    elif args.multibit:
        kw["params"] = "PARAM_MULTI_BIT_MESSAGE_2_CARRY_2_GROUP_3_KS_PBS"
    if args.op == "boolean_gate":
        ms, ok, meta = bench_boolean_gate(batch, args.iters, **kw)
    elif args.op == "shortint_add":
        ms, ok, meta = bench_shortint_add(batch, args.iters, **kw)
    elif args.op == "trivium_keystream":
        ms, ok, meta = bench_trivium(batch, args.iters, **kw)
    else:
        ms, ok, meta = bench_uint32(args.op, batch, args.iters, **kw)
    print(f"# total wall {time.time() - t0:.1f}s", file=sys.stderr)

    metric = args.op + ("_mb" if args.multibit else "")
    base = BASELINES_MS[args.op]
    rec = {"metric": metric, "value": round(ms, 3), "unit": "ms/op",
           "vs_baseline": round(base / ms, 2) if base else None,
           "baseline_ms": base, "correct": ok, **meta}
    print(json.dumps(rec))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SUITE.json")
    try:
        with open(path) as f:
            all_recs = json.load(f)
    except (OSError, ValueError):
        all_recs = {}
    if not args.test_params:
        all_recs[metric] = rec
        with open(path, "w") as f:
            json.dump(all_recs, f, indent=1)


if __name__ == "__main__":
    main()
