#!/bin/bash
# Build the native runtime components.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -fopenmp -std=c++17 mesher.cpp -o libmesher.so
echo "built libmesher.so"
