"""Test configuration: force the CPU backend with 8 virtual devices so
multi-device sharding paths are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image pre-configures jax_platforms='axon,cpu' (TPU-tunnel first);
# the env var alone doesn't override it, so force CPU here before any
# backend is initialized.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from multimodal_rare_disease_tpu.parallel import create_mesh

    return create_mesh()


@pytest.fixture(scope="session")
def default_cfg():
    from multimodal_rare_disease_tpu.config import resolve_config

    return resolve_config()


# Wall-clock note: this environment has ONE vCPU, so JAX CPU compiles
# dominate the suite (~9 min for `-m "not slow"`, minutes more for the
# slow tier). On a normal multi-core dev box the fast tier is ~1-2 min.
