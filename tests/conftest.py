"""Test config: run everything on CPU with 8 virtual devices so multi-chip
sharding logic (TP/DP over a Mesh) is exercised without TPU hardware —
the strategy SURVEY.md §4 prescribes."""
import os

# Force CPU even if the outer environment points JAX at a TPU platform
# (tests must be hermetic and fast; the bench harness is what runs on TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend programmatically, which
# wins over the env var — force the platform through jax.config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
