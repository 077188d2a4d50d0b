#!/bin/sh
# CPU test runner: bypasses the axon TPU tunnel (its pool connection can
# block interpreter startup) and emulates 8 devices for sharding tests.
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m pytest "$@"
