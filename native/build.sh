#!/bin/sh
# Build the native data-plane library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libminer_data.so miner_data.cpp
echo "built $(pwd)/libminer_data.so"
