#!/bin/sh
# Build the native helpers (rosbag decoder). Produces native/libbagreader.so
set -e
cd "$(dirname "$0")/.."
EXTRA=""
if [ -f /usr/include/bzlib.h ]; then
  EXTRA="-DHAVE_BZ2 -DHAVE_BZLIB_H -lbz2"
else
  # dev headers absent but the runtime library present (this image):
  # declare the stable BZ2_bzBuffToBuffDecompress ABI ourselves and link
  # the versioned soname directly
  for LIB in /lib/x86_64-linux-gnu/libbz2.so.1.0 /usr/lib/x86_64-linux-gnu/libbz2.so.1.0; do
    if [ -e "$LIB" ]; then
      EXTRA="-DHAVE_BZ2 -l:libbz2.so.1.0"
      break
    fi
  done
fi
g++ -O2 -shared -fPIC -std=c++17 native/bagreader.cpp -o native/libbagreader.so $EXTRA
echo "built native/libbagreader.so ($EXTRA)"
