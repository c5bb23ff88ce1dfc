"""Test environment: force an 8-device virtual CPU mesh before JAX loads.

This is the standard TPU-less way to exercise pjit/sharding code paths
(SURVEY.md §4): all multi-device tests run against 8 virtual CPU devices.
"""

import os
import sys
from pathlib import Path

# Force CPU: the environment presets JAX_PLATFORMS=axon (real TPU tunnel),
# which must not leak into unit tests. The axon plugin ignores the env var,
# so the config API is the authoritative switch.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 0


@pytest.fixture(autouse=True)
def _reset_parallel_context():
    """The trace-time parallel context (vit_ssl_tpu/parallel/context.py)
    is process-global by design (trainers publish it before compiling
    steps). Tests that build trainers with sp/tp meshes must not leak
    that routing into later tests' unrelated shard_maps."""
    yield
    try:
        from vit_ssl_tpu.parallel import set_parallel_context

        set_parallel_context(None)
    except Exception:
        pass


# Captured at conftest import — before any test or fixture has run — so
# restoration always returns to the true session baseline. A per-test
# snapshot is NOT enough: module-scoped fixtures (e.g. test_moe's
# ep1_base) run the in-process CLI *before* the function-scoped autouse
# fixture's setup, so a setup-time snapshot records the already-poisoned
# 'rbg' and then "restores" it forever (bit the multihost in-process
# oracle a second time this way).
_BASELINE_PRNG_IMPL = jax.config.jax_default_prng_impl


@pytest.fixture(autouse=True)
def _reset_default_prng_impl():
    """train.py sets ``jax_default_prng_impl`` process-globally (fine for
    the real CLI, which owns its process). Tests and module-scoped
    fixtures that drive the CLI in-process must not leak 'rbg' into later
    tests whose oracles assume the default threefry keys."""
    yield
    if jax.config.jax_default_prng_impl != _BASELINE_PRNG_IMPL:
        jax.config.update("jax_default_prng_impl", _BASELINE_PRNG_IMPL)
