#!/bin/sh
# Build the native data-plane library. The ABI version in the filename must
# match ABI_VERSION in miner_tpu/data/native.py (and the value returned by
# miner_data_abi_version() in miner_data.cpp).
set -e
cd "$(dirname "$0")"
ABI=2
g++ -O3 -march=native -shared -fPIC -std=c++17 -o "libminer_data.v${ABI}.so" miner_data.cpp
echo "built $(pwd)/libminer_data.v${ABI}.so"
