"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(parallel/) execute without TPU hardware, per SURVEY.md §4's strategy of
testing distributed logic via --xla_force_host_platform_device_count.
Must set env before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and sets
# jax_platforms='axon,cpu' at interpreter start; pin it back to CPU before
# any backend initialization so tests run on the 8 virtual CPU devices.
jax.config.update("jax_platforms", "cpu")

# ETDRK4 phi-table disk cache: without this, every etd model build in
# the suite would write table files into ./output/etd_cache relative to
# the test CWD. One shared per-run tmp dir keeps the repo clean AND
# lets repeated same-config builds across tests hit the cache. Tests of
# the cache itself override the env per-test (tests/test_etd_scalar.py).
if "XFB_ETD_CACHE" not in os.environ:
    import tempfile

    os.environ["XFB_ETD_CACHE"] = tempfile.mkdtemp(prefix="xfb_etd_")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from xlab_fftbarotropic_tpu.config import ModelConfig  # noqa: E402


@pytest.fixture
def small_cfg():
    """Small square grid for fast differential tests."""
    return ModelConfig(nx=64, ny=64, lx=600_000.0, ly=600_000.0,
                       dt=3.0, nu=6.5, record_step=10, total_steps=20)


@pytest.fixture
def cfg128():
    return ModelConfig(nx=128, ny=128)


@pytest.fixture
def rng():
    return np.random.RandomState(1234)


# --------------------------------------------------------------------------
# Fast/slow test tiers (round-3 VERDICT item 4): the interpret-mode
# Pallas/overlap soaks below cost 10-140 s EACH on the CPU mesh (~16 of
# the suite's ~23 minutes), which made the default gate too expensive to
# run habitually. Default `pytest -q` skips them (<5-8 min); the FULL
# suite — the pre-commit/driver-parity gate — is `pytest --slow`. The
# skipped tests are all redundant-at-smoke-level: every kernel they soak
# also has a fast differential test; what they add is long-horizon /
# cross-impl coverage that must stay green before a commit that touches
# ops/ or parallel/.
# --------------------------------------------------------------------------

_SLOW_NODEID_PATTERNS = (
    "test_xpencil.py::test_xpencil_sw_segment_matches_single[overlap]",
    "test_xpencil.py::test_xpencil_barotropic_segment_matches_single",
    "test_pallas_overlap.py::test_sharded_model_with_overlap_fft",
    "test_pallas_store.py::",                  # whole-file kernel soaks
    "test_pallas_sw.py::test_pstore_bf16_bounded",
    "test_pallas_sw.py::test_ky_all_bit_identical",
    "test_pallas_sw.py::test_split_linear_matches_default",
    "test_pallas_sw.py::test_field_minor_orders_bit_identical",
    "test_pallas_sw.py::test_yfirst_matches_xfirst",
    "test_pallas_sw.py::test_forced_step_matches_xla",
    "test_pallas_sw.py::test_model_segment_trajectory_pin",
    "test_pallas_sw.py::test_rk4_step_planes_matches_rk4_step",
    "test_pallas_sw.py::test_bf16_transforms_corrupt_sw_balance",
    "test_etdrk4.py::test_etd_fuse_matches_unfused",
    "test_etdrk4.py::test_plane_path_matches_xla_path",
    "test_etdrk4.py::test_plane_path_carries_drag",
    "test_pallas_tracer.py::test_tracer_planes_match_xla",
    "test_pallas_tracer.py::test_tracer_planes_forced_drag_beta_nu4",
    "test_pallas_diff.py::test_rollout_gradient_pallas_vs_xla",
    "test_pallas_fft.py::test_mm_bf16x3_shallow_water",
    "test_pallas_fft.py::test_mm_bf16x3_trajectory_accuracy",
    "test_pallas_fft.py::test_bt_yfirst_matches_xfirst",
    "test_pallas_fft.py::test_fusekb_bit_identical",
    "test_pallas_fft.py::test_fusetail_bit_identical",
    "test_pallas_overlap.py::test_overlapped_pair_matches_dfft",
    "test_adjoint.py::test_segmented_rollout_matches_unsegmented",
    "test_adjoint.py::test_sharded_gradient_matches_single_device",
    "test_adjoint.py::test_assimilate_cli_end_to_end",
    "test_adjoint.py::test_sw_and_tracer_grads_finite",
    "test_beta.py::test_adjoint_rollout_carries_beta",
)


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="run the FULL suite including the slow interpret-mode "
             "Pallas/overlap/adjoint soaks (the pre-commit gate)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(
        reason="slow tier — run `pytest --slow` for the full gate")
    for item in items:
        if any(p in item.nodeid for p in _SLOW_NODEID_PATTERNS):
            item.add_marker(skip)
