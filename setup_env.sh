#!/bin/bash
# Equivalent of the reference's setup_env.sh (PATH/LD_LIBRARY_PATH for its
# binaries and libfieldio.so): put the package on PYTHONPATH (APPEND — the
# deployment may carry its own entries) and build the native runtime libs.
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}$REPO"
make -C "$REPO/native" >/dev/null 2>&1 || \
    echo "note: native libs not built (no toolchain?); pure-Python fallbacks active"
