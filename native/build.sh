#!/bin/bash
# Build the native host libraries into vartrix_tpu/_native/.
set -e
cd "$(dirname "$0")"
mkdir -p ../vartrix_tpu/_native
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread swlib.cpp -o ../vartrix_tpu/_native/libvartrixsw.so
if [ -f genomio.cpp ]; then
  g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread genomio.cpp -o ../vartrix_tpu/_native/libgenomio.so -lz
fi
if [ -f cramio.cpp ]; then
  # libbz2 has no dev symlink on this image: link the runtime soname
  g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread cramio.cpp -o ../vartrix_tpu/_native/libcramio.so -lz -llzma -l:libbz2.so.1
fi
echo "built: $(ls ../vartrix_tpu/_native/)"
