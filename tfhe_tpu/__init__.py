"""tfhe_tpu — a TPU-native TFHE (fully homomorphic encryption over the torus)
framework in JAX/Pallas.

Capability-parity rebuild of the reference `tfhe-rs` 0.5 fork with
odd-plaintext-modulus "p-encodings" (see SURVEY.md).  The compute path is
JAX/XLA with exact CRT-NTT polynomial kernels; ciphertexts are batched
unsigned-integer arrays; batch is the TPU-parallel axis and scales across
chips via `jax.sharding` meshes (tfhe_tpu.parallel).

Layout (bottom-up, mirroring the reference's layer map):
  core/      — params, torus numerics, PRNG, entities, NTT, algorithms
  boolean/   — encrypted Boolean gates (32-bit torus)
  shortint/  — message+carry LWE words with LUT bootstrapping (the workhorse)
  integer/   — radix/CRT big integers over shortint blocks
  gadget/    — fork's odd-modulus p-encodings Boolean engine
  hlapi/     — FheUint/FheBool user types with operator overloading
  parallel/  — device-mesh sharding of batched bootstraps
  utils/     — serialization, key cache, seeding
"""

import sys as _sys

import jax as _jax

# The 64-bit discretized torus requires uint64 arrays.
_jax.config.update("jax_enable_x64", True)

# Deep fused kernels (pallas_ntt) build long expression chains; the default
# recursion limit is too small for their tracing.
_sys.setrecursionlimit(max(_sys.getrecursionlimit(), 20000))

# Persistent compilation cache: the fused PBS kernel takes minutes to compile
# (remote TPU tunnels especially); cache executables across processes.
# Opt out with TFHE_TPU_COMPILE_CACHE=0 or point it elsewhere.
import os as _os

_cache_dir = _os.environ.get("TFHE_TPU_COMPILE_CACHE",
                             _os.path.expanduser("~/.cache/tfhe_tpu_xla"))
if _cache_dir not in ("0", ""):
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

__version__ = "0.1.0"

from . import core  # noqa: E402,F401
