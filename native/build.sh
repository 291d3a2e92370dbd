#!/bin/sh
# Build the native runtime components into native/lib/.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -fopenmp -shared -fPIC acap.cpp -o lib/libgmacap.so
echo "built lib/libgmacap.so"
