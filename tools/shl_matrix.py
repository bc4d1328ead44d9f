#!/usr/bin/env python
"""Diagnostic: per-call cost of the GGSW shift path on chip.

The round-5 uint64_shl bench recorded 3239 ms/op at batch 16 (51.8 s per
batched call) while the round-4 32-block p_fail run chained rotations at
1-7.5 s per call and round-4's uint32_shl row measured 81 ms/op — a gap
the op-count model cannot produce.  This times four configs through the
exact bench path to split (nb, batch, kind, build) effects:

  shl  nb=16 @64  — replicates the round-4 BENCH_SUITE row (expect ~5 s/call)
  shl  nb=32 @16  — replicates the anomaly (expect ~52 s/call)
  shl  nb=32 @64  — batch scaling of the anomaly
  rotl nb=32 @64  — replicates the round-4 PFAIL_SHIFT evidence (~7.5 s/call)
"""
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
    params = shortint_params("PARAM_MESSAGE_2_CARRY_2_KS_PBS")
    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        kc = KeyCache(root=os.path.join(REPO, "keys_cache"))
        ck, sk = kc.get(f"{params.name}_seed1",
                        lambda: shortint.gen_keys(params, seed=1))
        shk = kc.get(f"{params.name}_shiftkey2_seed1",
                     lambda: new_shift_key(ck, sk, "auto", seed=1))
    rsk_host = integer.ServerKey(key=sk, shift_key=shk)
    rsk = jax.device_put(rsk_host, dev)
    rng = np.random.default_rng(5)

    results = {}
    for kind, nb, batch in (("shl", 16, 64), ("shl", 32, 16),
                            ("shl", 32, 64), ("rotl", 32, 64)):
        width = 2 * nb
        mask = np.uint64((1 << width) - 1)
        with jax.default_device(cpu):
            rck = RadixClientKey(key=ck, num_blocks=nb)
            vals = rng.integers(0, 1 << width, batch, dtype=np.uint64)
            amts = rng.integers(0, width, batch, dtype=np.uint64)
            v = rck.encrypt(jnp.asarray(vals), seed=41)
            s = rck.encrypt(jnp.asarray(amts), seed=42)
        vd = jax.device_put(jnp.stack([b.lwe.data for b in v.blocks]), dev)
        sd = jax.device_put(jnp.stack([b.lwe.data for b in s.blocks]), dev)

        def radix_from(data, proto):
            p0 = proto.blocks[0]
            return RadixCiphertext(blocks=[
                Block(lwe=LweCiphertext(data=data[i]),
                      degree=p0.message_modulus - 1,
                      message_modulus=p0.message_modulus,
                      carry_modulus=p0.carry_modulus)
                for i in range(data.shape[0])])

        @jax.jit
        def step(vd, sd, key, kind=kind, v=v, s=s):
            va = radix_from(vd, v)
            sa = radix_from(sd, s)
            out = (key.left_shift(va, sa) if kind == "shl"
                   else key.rotate_left(va, sa))
            return jnp.stack([b.lwe.data for b in out.blocks])

        t0 = time.time()
        out = step(vd, sd, rsk)
        np.asarray(out)
        t_first = time.time() - t0
        with jax.default_device(cpu):
            host = jax.device_put(out, cpu)
            dec = np.asarray(rck.decrypt(radix_from(host, v)))
        r = amts % width
        if kind == "shl":
            exp = (vals << r) & mask
        else:
            exp = ((vals << r) | ((vals & mask) >> (width - r) % width)) & mask
        ok = bool(np.array_equal(dec, exp))
        cur = vd + out
        t0 = time.time()
        for _ in range(2):
            out = step(cur, sd, rsk)
            cur = cur + out
        np.asarray(out)
        dt = (time.time() - t0) / 2
        key = f"{kind}{2*nb}@{batch}"
        results[key] = {"s_per_call": round(dt, 2),
                        "ms_per_op": round(dt * 1000 / batch, 1),
                        "first_s": round(t_first, 1), "correct": ok}
        print(json.dumps({key: results[key]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
