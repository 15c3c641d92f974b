"""Test harness config: force CPU with an 8-device virtual mesh.

Note: the environment may pre-import jax at interpreter startup (sitecustomize
PJRT plugins), so setting JAX_PLATFORMS via os.environ here can be too late —
we also update jax.config directly. XLA_FLAGS is still honored because
backends are only instantiated at first use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")
