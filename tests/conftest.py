"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding/pjit logic is validated without TPU hardware the standard way
(`XLA_FLAGS=--xla_force_host_platform_device_count=8`); kernels run in
interpret/CPU mode. Must set env vars before jax is imported anywhere.
"""

import os

# Overwrite (not setdefault): the ambient environment may point JAX at a
# remote TPU, which is both slow for unit tests and bf16-default. Some
# environments pin the platform via jax.config in sitecustomize (which
# overrides env vars), so force it at the config level too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "demo_data"))
