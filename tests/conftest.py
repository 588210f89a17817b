"""Test harness config: run everything on CPU with 8 virtual devices so
data-parallel tests exercise a real mesh without TPU hardware
(SURVEY.md §5 item 5)."""

import os

# Must be set before jax is imported anywhere. Forced (not setdefault):
# the host environment pins JAX_PLATFORMS to the real chip, but unit tests
# must run on the virtual CPU mesh. Set CAPTIONKIT_TEST_TPU=1 to run the
# hardware-marked tests on the real device instead.
if os.environ.get("CAPTIONKIT_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    # The host image's sitecustomize imports jax at interpreter startup
    # (before conftest), latching JAX_PLATFORMS=axon into jax.config —
    # so the env var alone is not enough.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_num_cpu_devices", 8
    )  # virtual 8-device mesh for DP tests
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
