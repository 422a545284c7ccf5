"""Test configuration: simulate an 8-device TPU mesh on CPU.

The reference has no distributed code and hence no fake backends
(SURVEY.md §4); we deliberately test mesh sharding + collectives on a
virtual 8-device CPU platform, the standard JAX trick.

Two environment fixes are required in this image:
  * JAX_PLATFORMS=axon is pinned globally (the real TPU chip); tests must
    override it to cpu;
  * PYTHONPATH injects /root/.axon_site, whose plugin import probes the
    TPU tunnel even for CPU runs (and hangs when the tunnel is busy) —
    strip it from sys.path before jax initialises.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_NUM_CPU_DEVICES"] = "8"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if "axon" not in p
)
sys.path[:] = [p for p in sys.path if "axon" not in p]

import jax  # noqa: E402

# jax is pre-imported by this image's sitecustomize with JAX_PLATFORMS=axon
# baked into jax.config — env changes after import are ignored, so flip the
# config directly (before any backend initialises).
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
assert jax.default_backend() == "cpu", "tests must run on the CPU platform"
assert len(jax.devices()) == 8, "tests expect a virtual 8-device CPU mesh"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def chain_mesh():
    from jax.sharding import Mesh
    import numpy as np

    return Mesh(np.array(jax.devices()), ("chains",))
