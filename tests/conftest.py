"""Test config: run the suite on CPU with 8 virtual devices.

Per SURVEY.md §4.2.5, distributed code paths (mesh-sharded BA, multi-sequence
DP) are exercised in CI without a TPU pod by forcing the host platform to
expose 8 devices.

NOTE: this container pre-registers a remote 'axon' TPU backend from
sitecustomize and latches jax config at interpreter start, so
``JAX_PLATFORMS=cpu`` in the environment is ignored; the only reliable switch
is ``jax.config.update("jax_platforms", "cpu")`` after import (verified: env
var leaves devices on TPU with ~1s remote compiles per shape; config.update
yields 8 CpuDevices with ~0.1s local compiles).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
