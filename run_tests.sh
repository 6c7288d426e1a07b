#!/usr/bin/env bash
# Run the test suite WITHOUT claiming the TPU session.
#
# Every python process in this environment registers the axon TPU backend at
# import (sitecustomize); a pytest run racing a TPU job deadlocks the relay.
# Clearing PALLAS_AXON_POOL_IPS skips registration entirely; the tests force
# the CPU backend anyway (tests/conftest.py).
set -euo pipefail
cd "$(dirname "$0")"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ "${@:--q}"
