"""Test config: force the LOCAL CPU backend with 8 virtual devices.

The session environment boots an `axon` remote-TPU PJRT plugin from
sitecustomize at interpreter start (JAX_PLATFORMS=axon); running tests over
that tunnel costs a network round trip per dispatch. jax.config.update
re-selects the cpu platform even after the plugin registered. The 8 virtual
CPU devices mirror how the driver validates `dryrun_multichip`.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
