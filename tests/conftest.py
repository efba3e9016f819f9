"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware.

Note: this image preloads a TPU PJRT plugin via sitecustomize and pins
``JAX_PLATFORMS=axon`` in the environment, so a plain ``setdefault`` is not
enough — we must overwrite the platform through ``jax.config`` (jax reads
the env var at import time, which happens before pytest collects us).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Fast cross-layer smoke tier: one representative module per layer, chosen to
# avoid the expensive XLA compiles (model forwards at full size, CLI drives,
# reference-execution harnesses). `pytest -m quick` should finish in <5 min.
QUICK_MODULES = {
    "test_constants",      # L0 config/constants
    "test_targets",        # L1 data / target gen
    "test_cocoeval",       # evaluator math
    "test_decode_oracle",  # L4 decode (numpy backend, no compile)
    "test_decode_native",  # L4 decode (C++ backend)
    "test_resize",         # runtime resize parity
    # test_bench is deliberately NOT here: the full bench loop costs
    # ~7 min of XLA compiles on CPU (the whole tier's budget); the
    # driver runs bench.py directly every round and the full suite
    # still covers the contract.
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in QUICK_MODULES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def vgg_model_and_vars():
    """One real vgg2016 init shared by every test that needs numerics
    (XLA CPU compiles are expensive on small CI hosts)."""
    from torch_ekpose_tpu.models import init_model

    return init_model("vgg2016", input_shape=(1, 64, 64, 3))
