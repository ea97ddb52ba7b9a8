"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests run against XLA's
host-platform device emulation. NOTE: this environment preloads jax via a
sitecustomize hook with JAX_PLATFORMS=axon (the TPU tunnel), so env vars set
here are too late — we must switch platform via jax.config. CPU is required
because the TPU path emulates float64 transcendentals at reduced precision
and the golden-reference solvers need true f64. Benchmarks run on the real
chip outside pytest.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402 (may already be preloaded by sitecustomize)

jax.config.update("jax_platforms", "cpu")
# float64 available for golden-reference solvers; TPU-path code is explicitly
# dtype-disciplined (takes/casts float32) so this does not change its behavior.
jax.config.update("jax_enable_x64", True)
# NOTE: the persistent compilation cache is deliberately NOT enabled here —
# this machine's XLA:CPU AOT artifacts are compiled with target features the
# host doesn't report (prefer-no-scatter/gather), and reloading them across
# processes triggers machine-feature-mismatch warnings with SIGILL risk.
