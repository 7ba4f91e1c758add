"""Test configuration: run everything on a virtual 8-device CPU mesh.

Pallas kernels run in interpreter mode on CPU (flasht5_tpu.runtime), and
multi-chip sharding tests get 8 virtual devices via
--xla_force_host_platform_device_count (the multi-host simulation strategy
the reference lacks; SURVEY.md §4 implications).

The environment may pre-initialize a TPU backend at interpreter startup
(sitecustomize); tests must not run against the real chip, so the backend is
forcibly switched back to CPU before any test imports jax-using code.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge  # noqa: E402

if xla_bridge.backends_are_initialized():
    xla_bridge._clear_backends()

import flasht5_tpu.runtime  # noqa: E402

flasht5_tpu.runtime.interpret_mode.cache_clear()
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8

jax.config.update("jax_default_matmul_precision", "highest")
