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

jax.config.update("jax_enable_x64", True)
