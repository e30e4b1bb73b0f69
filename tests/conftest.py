"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated
on host CPU devices exactly as the driver's dryrun does.
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (remote TPU tunnel),
# which is far too slow for eager unit tests.  Also clear the axon relay
# pool so sitecustomize never dials the single-tenant TPU grant (a second
# process would hang on it).  Best invoked as:
#   PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# HARD-force the cpu backend: the image's sitecustomize registers the
# axon/TPU PJRT plugin at interpreter start and (when the single-tenant
# TPU grant is free) overrides the platform selection, so the
# JAX_PLATFORMS env set above is too late when pytest is launched bare.
# jax.config wins over the plugin's registration as long as no backend
# has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh; launch as "
    "PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/")
assert len(jax.devices()) >= 8
