"""Test configuration: force CPU backend with 8 virtual devices so
vmap/shard_map multi-chip paths are exercised without TPU hardware
(mirrors the build plan in SURVEY.md §4)."""

import os

# Must be set before jax is imported anywhere. Force-set (not setdefault):
# the environment may pre-select a TPU platform via sitecustomize.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize imports jax at interpreter start, which bakes
# JAX_PLATFORMS=axon into the config BEFORE this file's env-set runs.
# config.update overrides the baked value either way, so the suite can
# never fall through to a (possibly dead) TPU relay attach.
jax.config.update("jax_platforms", "cpu")

# Geometry math in tests assumes f32-accurate matmuls.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: most of the suite's wall time is XLA:CPU
# compilation of big render/settle programs; warm re-runs skip it.
# The dir is keyed by a host-CPU fingerprint: XLA:CPU AOT results encode
# the compile machine's feature set, and loading an executable cached by
# a DIFFERENT host (rounds run on varying machines) can SIGILL/segfault
# (cpu_aot_loader warns "Machine type ... doesn't match").
import hashlib
import pathlib


def _host_cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.md5(platform.processor().encode()).hexdigest()[:10]


_cache = (
    pathlib.Path(__file__).resolve().parent.parent
    / ".jax_cache_cpu"
    / _host_cpu_fingerprint()
)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pathlib

import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")
CUBE_GLB = REFERENCE_DIR / "tests" / "cube.glb"
BUNNY_GLTF = REFERENCE_DIR / "tests" / "stanford_bunny" / "scene.gltf"


@pytest.fixture(scope="session")
def cube_glb():
    if not CUBE_GLB.exists():
        pytest.skip("reference cube.glb fixture not available")
    return str(CUBE_GLB)


@pytest.fixture(scope="session")
def bunny_gltf():
    if not BUNNY_GLTF.exists():
        pytest.skip("reference bunny fixture not available")
    return str(BUNNY_GLTF)
