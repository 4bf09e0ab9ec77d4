"""Test configuration: force the CPU platform with 8 virtual devices.

The analogue of the reference's FakeThrustRTC trick (running "GPU" code
without a GPU, reference ``PySDM/backends/impl_thrust_rtc/test_helpers/``):
sharding/multi-chip tests run on an emulated 8-device CPU mesh
(``xla_force_host_platform_device_count``), and all physics tests run in
float64 on CPU for exactness. Benchmarks (bench.py) run on the real TPU chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the env var JAX_PLATFORMS is not reliably honored under the axon TPU plugin;
# the config update below is (must run before any backend initialisation)
jax.config.update("jax_platforms", "cpu")
