#!/bin/sh
# Build the native helpers (rosbag decoder). Produces native/libbagreader.so
set -e
cd "$(dirname "$0")/.."
EXTRA=""
if [ -f /usr/include/bzlib.h ]; then
  EXTRA="-DHAVE_BZ2 -lbz2"
fi
g++ -O2 -shared -fPIC -std=c++17 native/bagreader.cpp -o native/libbagreader.so $EXTRA
echo "built native/libbagreader.so ($EXTRA)"
