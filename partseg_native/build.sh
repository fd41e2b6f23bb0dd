#!/bin/sh
# Build the native loader: g++ -O3 shared lib linking libjpeg + libpng.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    loader.cc -ljpeg -lpng -o libpartseg_native.so
echo "built $(pwd)/libpartseg_native.so"
