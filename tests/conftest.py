"""Test config: run on a virtual 8-device CPU mesh.

Must set platform env vars before jax is imported anywhere.
"""

import os

# Force CPU even if the session exports JAX_PLATFORMS=axon (the remote TPU
# tunnel): eager dispatch over the tunnel makes tests pathologically slow.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-registers the remote-TPU backend and overrides
# JAX_PLATFORMS; this config update wins as long as no backend is initialised.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
