#!/bin/sh
# Build the native runtime components into libemoasr_native.so.
# Usage: sh emoasr_tpu/native/build.sh
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -shared -fPIC -pthread \
    edit_distance.cpp batch_loader.cpp \
    -o libemoasr_native.so
echo "built $(pwd)/libemoasr_native.so"
