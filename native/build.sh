#!/bin/sh
# Build the native decoder into the Python package (cmake or direct g++).
set -e
cd "$(dirname "$0")"
OUT=../multiagentperception_tpu/native/libmapdecode.so
if command -v cmake >/dev/null 2>&1 && command -v ninja >/dev/null 2>&1; then
    cmake -S . -B build -G Ninja >/dev/null
    cmake --build build >/dev/null
    cp build/libmapdecode.so "$OUT"
else
    g++ -O2 -fPIC -shared -std=c++17 decoder.cpp -lpng -o "$OUT"
fi
echo "built $OUT"
