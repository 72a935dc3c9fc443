"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no tests (SURVEY §4); this suite is built new.  Multi-chip
sharding paths are exercised on CPU via
``--xla_force_host_platform_device_count=8`` — the TPU-native analog of a
fake backend.

Note: the session environment may pre-import jax with a TPU platform forced
(JAX_PLATFORMS=axon via sitecustomize), so the env var alone is not enough —
the platform is overridden through jax.config after import, which takes
effect because no backend has been initialized yet at conftest time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
