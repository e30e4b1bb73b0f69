#!/bin/bash
# Run the test suite on CPU, detached from the TPU relay.
#
# The image's sitecustomize (PYTHONPATH=/root/.axon_site) registers the axon
# TPU PJRT plugin in EVERY python process and dials the single-tenant TPU
# relay at interpreter startup; concurrent processes hang on the grant.
# Clearing PALLAS_AXON_POOL_IPS makes sitecustomize skip registration so
# tests run purely on CPU and in parallel with TPU jobs.
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/ -q "$@"
