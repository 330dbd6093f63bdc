"""Test configuration: force an 8-device virtual CPU platform.

Environments that pin a default accelerator platform (e.g. via
sitecustomize) make plain env vars insufficient — we override the config
after importing jax but before any backend is instantiated.  Multi-chip
sharding tests then run on the 8 virtual CPU devices.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: solver graphs take 30-100 s to compile on the
# XLA CPU backend; cache them across test sessions
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import pytest


@pytest.fixture()
def rng(request):
    """Per-test deterministic generator, keyed by the test's own name.

    A shared session-scoped stream would make every test's random draws
    (IK targets, configurations) depend on which tests ran before it —
    flaky under ``-x``, ``-k`` subsets, or reordering.
    """
    import zlib

    return np.random.default_rng(zlib.crc32(request.node.name.encode()))
