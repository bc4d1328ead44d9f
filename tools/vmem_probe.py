"""Empirical probe: how much VMEM will Mosaic actually allocate on this chip?

The whole-rotation kernel's N=8192 working set (~18-26 MB) exceeds the
16 MB default scoped-vmem limit.  If the physical VMEM is larger, raising
CompilerParams.vmem_limit_bytes unlocks the fused path for the 3_3/4_4
regimes without restructuring.  This compiles a trivial kernel with an
`mb`-sized VMEM scratch at a raised limit and reports ok/fail per size.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(mb: int) -> bool:
    n_rows = mb * (1 << 20) // (128 * 4)

    def kernel(x_ref, o_ref, scratch):
        scratch[0, :] = x_ref[0, :] * jnp.float32(2.0)
        o_ref[...] = scratch[0:8, :]

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_rows, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(mb + 8) * (1 << 20)),
    )
    x = jnp.ones((8, 128), jnp.float32)
    try:
        out = jax.jit(f)(x)
        np.asarray(out)
        return True
    except Exception as e:
        print(f"  {mb} MB failed: {type(e).__name__}: {str(e)[:300]}",
              file=sys.stderr)
        return False


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [20, 32, 48, 64, 96, 110]
    print(f"device: {jax.devices()[0]}")
    for mb in sizes:
        ok = probe(mb)
        print(f"VMEM scratch {mb} MB: {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            break
