"""Test configuration: force CPU so tests are hermetic and fast.

Multi-device sharding tests do NOT force a host device count here — on this
2-core box, --xla_force_host_platform_device_count=8 adds ~30s of thread
contention to every pytest run. Instead, tests/test_sharding.py spawns
subprocesses with the flag set (SURVEY.md §4's multi-host-on-CPU recipe).
"""

import os

# Force CPU unconditionally: the driver environment routes JAX to the TPU
# tunnel (sitecustomize registers the 'axon' backend and sets the
# jax_platforms CONFIG, which beats the JAX_PLATFORMS env var — so the env
# var alone is not enough). Compiling every test over the tunnel is both
# slow and non-hermetic. Benchmarks (bench.py) use the real chip; tests
# never should.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
