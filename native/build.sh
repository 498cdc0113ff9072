#!/bin/sh
# Build libdddmr_host.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -fPIC -shared -o libdddmr_host.so dddmr_host.cpp -pthread
echo "built $(pwd)/libdddmr_host.so"
