#!/bin/sh
# Build the native runtime components into libemoasr_native.so.
# Usage: sh emoasr_tpu/native/build.sh
#
# The .so is built to a process-unique temp name and mv'd into place so a
# concurrent builder (parallel test runs, multi-host shared FS) can never
# dlopen a partially written library (mv within a directory is atomic).
set -e
cd "$(dirname "$0")"
tmp="libemoasr_native.so.tmp.$$"
trap 'rm -f "$tmp"' EXIT
g++ -O3 -std=c++17 -shared -fPIC -pthread \
    edit_distance.cpp batch_loader.cpp \
    -o "$tmp"
mv -f "$tmp" libemoasr_native.so
echo "built $(pwd)/libemoasr_native.so"
