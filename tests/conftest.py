"""Test harness: force the XLA CPU backend with 8 virtual devices so the
multi-chip sharding path (SURVEY.md §2.4) is exercised without TPU hardware.

Note: this environment's sitecustomize registers a remote-TPU ("axon")
PJRT plugin and force-sets ``jax_platforms="axon,cpu"`` at interpreter
start, overriding the JAX_PLATFORMS env var — so we must override it back
via jax.config *after* import, before any device use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # harmless; the config update below wins
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # XLA_FLAGS fallback above covers older jax

# Persistent compilation cache: the pipeline graphs take minutes to compile
# on CPU; cache across test runs.
_cache_dir = os.path.expanduser("~/.cache/hikari_tpu_jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass

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
