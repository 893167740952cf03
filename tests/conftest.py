"""Test harness: force the XLA CPU backend with 8 virtual devices so the
multi-chip sharding path (SURVEY.md §2.4) is exercised without TPU hardware.
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# Force CPU even when the environment preselects a TPU platform (e.g.
# JAX_PLATFORMS=axon): unit tests must not depend on TPU availability.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def cornell_scene():
    from hikari_tpu.io.scenes import cornell_box_scene

    return cornell_box_scene()


@pytest.fixture(scope="session")
def cornell_buffers(cornell_scene):
    from hikari_tpu.scene import build_scene_buffers

    return build_scene_buffers(cornell_scene)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
