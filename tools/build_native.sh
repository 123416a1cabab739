#!/bin/bash
# Build the native helper library (SA-IS suffix sorter).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libsaltnative.so sais.cpp ssw_native.cpp
echo "built $(pwd)/libsaltnative.so"
