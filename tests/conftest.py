"""Test env: force an 8-virtual-device CPU platform so every sharded code
path (mesh creation, shard_map collectives, pjit shardings) is exercised
without TPU hardware (SURVEY.md §4 'Implication for the new framework')."""
import os

# Force CPU: the ambient env tunnels to a single TPU chip (JAX_PLATFORMS=axon,
# registered by sitecustomize before conftest runs, overriding the env var);
# tests validate sharding on 8 virtual CPU devices instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sitecustomize plugin force-selects the axon backend; this wins over it.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
