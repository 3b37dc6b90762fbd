"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding logic (DP/pjit/shard_map paths) is exercised without TPU hardware,
per SURVEY.md section 4's test-strategy mandate."""

import os

# The machine profile exports JAX_PLATFORMS=axon (TPU tunnel); tests must be
# hermetic and deterministic, so force CPU BOTH via env (for subprocesses)
# and via jax.config (the axon plugin can win over the env var).
os.environ["JAX_PLATFORMS"] = "cpu"
# CLI mains enable the persistent compilation cache; tests must not write
# to ~/.cache (and must not depend on prior runs' executables).
os.environ["BETAPOSE_COMPILE_CACHE"] = "off"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
