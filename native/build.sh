#!/bin/sh
# Build the native host-side library (see lemo_tpu/ops/native.py).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libchamfer_cpu.so chamfer_cpu.cpp
echo "built $(pwd)/libchamfer_cpu.so"
