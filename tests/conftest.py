"""Test configuration: force CPU with 8 virtual devices so multi-chip mesh
code paths (pjit/shard_map over a Mesh) are exercised without TPU hardware —
the SURVEY.md §4 strategy for testing distributed code on CI.

Must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may pin a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# repo root on sys.path so `import agplace_tpu` works without install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# A sitecustomize may have force-registered a TPU plugin platform at
# interpreter start (overriding JAX_PLATFORMS); pin the config explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
