#!/bin/sh
# Build the native host runtime -> runtime/libiclrt.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libiclrt.so iclrt.cc
echo "built $(pwd)/libiclrt.so"
