#!/bin/bash
# Round-4 serial TPU bench queue — run ONE instance only (see CLAUDE.md on
# background TPU queue discipline).
cd /root/repo || exit 1
ulimit -s unlimited
set -x
python tools/bench_suite.py --op uint32_shl  --batch 64 --iters 3
python tools/bench_suite.py --op uint32_rotl --batch 64 --iters 3
python tools/bench_suite.py --op uint32_div  --batch 8  --iters 2
python tools/bench_suite.py --op uint16_div  --batch 16 --iters 2
python tools/bench_suite.py --op uint8_mul   --batch 64 --iters 3
python tools/bench_suite.py --op uint64_add  --batch 128 --iters 3
python bench.py
