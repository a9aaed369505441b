#!/usr/bin/env bash
# Build the optional C fast-scan accelerator (pure optimization; the
# engine falls back to the byte-equivalent Python path when absent).
set -euo pipefail
cd "$(dirname "$0")/.."
INC=$(python3 -c "import sysconfig; print(sysconfig.get_paths()['include'])")
EXT=$(python3 -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
gcc -O2 -fPIC -shared -I"$INC" jsoup_spark/_native/fastscan.c \
    -o "jsoup_spark/_native/jsoup_fastscan${EXT}"
echo "built jsoup_spark/_native/jsoup_fastscan${EXT}"
