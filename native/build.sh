#!/bin/bash
# Build the native helpers into native/build/.
set -e
cd "$(dirname "$0")"
mkdir -p build
g++ -O3 -march=native -std=c++17 -shared -fPIC wordpiece.cpp -o build/libwordpiece.so
g++ -O3 -march=native -std=c++17 -pthread -shared -fPIC postings.cpp -o build/libpostings.so
echo "built native/build/libwordpiece.so + libpostings.so"
