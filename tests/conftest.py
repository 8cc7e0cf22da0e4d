"""Test config: force a genuine 8-device virtual CPU mesh.

The axon TPU plugin registers itself via sitecustomize at interpreter
startup and sets JAX_PLATFORMS=axon, which routes every compile through a
remote tunnel (minutes per fresh shape). Tests must run on local CPU:
force-assign (not setdefault) JAX_PLATFORMS before jax is imported.
Multi-chip sharding tests use the 8 virtual CPU devices; bench.py is the
only thing that should touch the real chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# the env var alone loses to the plugin's startup registration; the config
# knob wins as long as no backend has been used yet
jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU, got: " + str(jax.devices()))
