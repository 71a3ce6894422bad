#!/bin/bash
# CPU test runner: disables the axon TPU-relay hook (sitecustomize) which can
# block on the tunnel when multiple python processes run concurrently.
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu exec python -m pytest "$@"
