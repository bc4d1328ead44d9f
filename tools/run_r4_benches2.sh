#!/bin/bash
# Round-4 TPU bench queue, part 2 — ONE instance only.
cd /root/repo || exit 1
ulimit -s unlimited
set -x
python tools/bench_suite.py --op uint32_shl  --batch 64 --iters 3
python tools/bench_suite.py --op uint8_div   --batch 64 --iters 3
python tools/bench_suite.py --op uint16_div  --batch 16 --iters 2
python tools/bench_suite.py --op uint32_div  --batch 8  --iters 2
# kernel experiment: dense sub-blockdiagonal MXU stages (opt-in)
TFHE_TPU_SUBBT=2 python bench.py
