"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual XLA devices so sharding/collective code
paths are exercised without TPU hardware. This must run before jax is
imported anywhere.
"""

import atexit
import os
import shutil
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
# isolate the AOT executable disk cache from the user's real one — several
# code paths (init_gan_state, make_classifier_steps, the CLIs) write to it
_exec_cache_dir = tempfile.mkdtemp(prefix="ganffn_exec_test_")
os.environ["GANFFN_EXEC_CACHE"] = _exec_cache_dir
atexit.register(shutil.rmtree, _exec_cache_dir, ignore_errors=True)
# tests run on CPU arrays; compiled pallas kernels need real TPU (the
# interpret-mode kernel tests opt back in explicitly)
os.environ["GANFFN_PALLAS"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent XLA compile cache for the suite (round 5): the gate's cost is
# dominated by recompiling the same programs test after test (each
# make_*_step call builds a fresh jit closure; the depth-1 12-duel program
# alone costs ~65 s and is compiled by ~10 tests). The hosted TPU path
# bypasses this cache (CLAUDE.md) but XLA:CPU honors it: measured 67.6 s ->
# 13.5 s for the 12-duel step on a warm cache. The cache lives next to the
# framework's executable cache so it persists ACROSS suite runs on the box;
# keys include jax version + backend, so upgrades self-invalidate.
_jit_cache = os.path.join(
    os.path.expanduser("~"), ".cache", "gan_ffn_tpu_xla", "pytest_jit"
)
os.makedirs(_jit_cache, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _jit_cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
# The CLI entry points call utils.runtime.configure_tpu_runtime(), which
# re-points the cache at GANFFN_COMPILE_CACHE (default ~/.cache/...) —
# pin it to the SAME directory so mid-suite CLI tests don't split the
# cache in two.
os.environ.setdefault("GANFFN_COMPILE_CACHE", _jit_cache)

import jax

# The hosted TPU platform plugin ("axon") ignores JAX_PLATFORMS, so pin the
# default device to CPU explicitly — tests must be f32-exact and mesh tests
# need the 8 virtual CPU devices.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np
import pytest


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(scope="session")
def iemocap_pickle(tmp_path_factory):
    from gan_ffn_tpu.data.synthetic import write_synthetic_iemocap

    path = tmp_path_factory.mktemp("data") / "IEMOCAP_features.pkl"
    # Small fixture: fast to load, still multi-bucket.
    return write_synthetic_iemocap(str(path), n_train=24, n_test=8, min_len=4, max_len=40)


@pytest.fixture(scope="session")
def meld_pickle(tmp_path_factory):
    from gan_ffn_tpu.data.synthetic import write_synthetic_meld

    path = tmp_path_factory.mktemp("data") / "MELD_features_raw.pkl"
    return write_synthetic_meld(str(path), n_train=16, n_test=6, min_len=3, max_len=20)
