#!/bin/sh
# Build the native runtime components (C++ -> shared lib loaded via ctypes).
set -e
cd "$(dirname "$0")"
g++ -O2 -std=c++17 -shared -fPIC -o libmvt_native.so page_allocator.cpp
echo "built $(pwd)/libmvt_native.so"
