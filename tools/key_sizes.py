#!/usr/bin/env python
"""Key-size report: serialized sizes of client/server/public keys per named
parameter set, standard vs seeded (compressed) form — the analogue of the
reference's examples/utilities/boolean_key_sizes.rs /
shortint_key_sizes.rs utilities.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/key_sizes.py \
           [--params PARAM_MESSAGE_2_CARRY_2_KS_PBS] [--boolean DEFAULT_PARAMETERS]
Prints a JSON object of byte sizes.  Runs entirely on CPU (client-side
operation).  Use tiny sets via --test for a quick check.
"""
import argparse
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tfhe_tpu  # noqa: F401,E402 (x64)


def _size(obj) -> int:
    from tfhe_tpu.utils import serialization
    buf = io.BytesIO()
    serialization.save(obj, buf)
    return buf.getbuffer().nbytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="PARAM_MESSAGE_2_CARRY_2_KS_PBS")
    ap.add_argument("--boolean", default="DEFAULT_PARAMETERS_KS_PBS")
    ap.add_argument("--test", action="store_true", help="tiny insecure sets")
    args = ap.parse_args()

    from tfhe_tpu import boolean, shortint
    from tfhe_tpu.core.params import (TEST_PARAMS_BOOLEAN,
                                      TEST_PARAMS_SHORTINT)

    report = {}

    sp = TEST_PARAMS_SHORTINT if args.test else args.params
    ck, sk = shortint.gen_keys(sp, seed=1)
    report["shortint"] = {
        "params": getattr(sp, "name", sp) if not isinstance(sp, str) else sp,
        "client_key_bytes": _size(ck),
        "server_key_bytes": _size(sk),
    }
    from tfhe_tpu.shortint.server_key import gen_compressed_server_key
    csk = gen_compressed_server_key(ck, seed=2)
    report["shortint"]["compressed_server_key_bytes"] = _size(csk)

    bp = TEST_PARAMS_BOOLEAN if args.test else args.boolean
    bck, bsk = boolean.gen_keys(bp, seed=3)
    report["boolean"] = {
        "params": getattr(bp, "name", bp) if not isinstance(bp, str) else bp,
        "client_key_bytes": _size(bck),
        "server_key_bytes": _size(bsk),
    }

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
