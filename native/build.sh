#!/bin/sh
# Build the native data-plane library.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -o libdpmn_native.so lmdb_reader.cpp
echo "built $(pwd)/libdpmn_native.so"
