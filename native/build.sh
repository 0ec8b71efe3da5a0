#!/bin/bash
# Build the native loader shared library.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -o libnvit_loader.so nvit_loader.cpp -ljpeg -lpthread
echo "built $(pwd)/libnvit_loader.so"
