"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
logic (mesh layouts, collectives-based top-k merge) is exercised without TPU
hardware (SURVEY.md §4). Must run before the first ``import jax``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("MMRAG_BASE_DIR", "/tmp/mmrag_tests")

# The hosting environment may pre-register a TPU plugin that overrides
# JAX_PLATFORMS from the environment; force the CPU backend explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
