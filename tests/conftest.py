"""Test configuration: force the CPU backend with 8 virtual devices so
multi-device sharding paths are exercised without TPU hardware."""

import os

# MRD_TPU_TESTS=1 keeps the real-TPU platform so the `-m tpu` tier can
# assert compiled-Pallas numerics on the bench chip; everything else
# runs on the virtual 8-device CPU mesh.
_TPU_TIER = os.environ.get("MRD_TPU_TESTS") == "1"

if not _TPU_TIER:
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
if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# Test tiers (pyproject markers):
#   pytest -m smoke        every-commit gate, <30s: compile-light modules
#   pytest -m "not slow"   pre-snapshot gate, ~9-15 min on this 1-vCPU box
#   pytest                 full suite incl. one-epoch trainings
#   pytest -m tpu          compiled-Pallas numerics; needs the real chip
_SMOKE_MODULES = {
    "test_config.py", "test_parsers.py", "test_tokenizer.py",
    "test_checkpoint.py", "test_stats.py", "test_images.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.path is not None and item.path.name in _SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)


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
