"""Test configuration: simulate an 8-device TPU mesh on CPU.

The reference has no distributed code and hence no fake backends
(SURVEY.md §4); we deliberately test mesh sharding + collectives on a
virtual 8-device CPU platform, the standard JAX trick.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def chain_mesh():
    from jax.sharding import Mesh
    import numpy as np

    return Mesh(np.array(jax.devices()), ("chains",))
