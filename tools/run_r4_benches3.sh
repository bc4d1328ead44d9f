#!/bin/bash
# Round-4 queue 3: re-validate the shift path with the deep casting KSKs.
cd /root/repo || exit 1
ulimit -s unlimited
set -x
python tools/bench_suite.py --op uint32_shl  --batch 64 --iters 3
python tools/bench_suite.py --op uint32_rotl --batch 64 --iters 3
python tools/pfail_shift.py --batch 64 --iters 60
