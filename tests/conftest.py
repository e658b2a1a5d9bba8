"""Test configuration: force an 8-device virtual CPU mesh.

Kernels run in Pallas interpreter mode on CPU (auto-detected by
``sageattention_tpu.dispatch.default_interpret``); distributed tests get 8
virtual devices.  Must run before jax initializes, hence env vars at import.
"""

import os
import sys

import pytest

ON_TPU_LANE = os.environ.get("SAGE_TPU_TESTS") == "1"

if not ON_TPU_LANE:
    # Force CPU even when the shell exports JAX_PLATFORMS=axon (real TPU):
    # the default suite always runs on the virtual 8-device CPU mesh.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not ON_TPU_LANE:
    # jax may already be imported by a pytest plugin, freezing the
    # env-derived platform config — override it explicitly (backend not yet
    # initialized).
    jax.config.update("jax_platforms", "cpu")
    # CPU oracle accuracy: fp32 dots everywhere.  Do NOT set this in the
    # TPU lane — "highest" forces fp32 contract precision onto bf16/int8
    # Mosaic matmuls, which fails to lower ("Bad lhs type").
    jax.config.update("jax_default_matmul_precision", "highest")


def pytest_collection_modifyitems(config, items):
    """tpu-marked tests (compiled Mosaic, real chip) run only in the TPU
    lane:  SAGE_TPU_TESTS=1 PYTHONPATH=/root/.axon_site:$REPO \\
             python -m pytest tests -m tpu -q
    Everything else runs in the default CPU/interpret lane."""
    skip_tpu = pytest.mark.skip(reason="needs real TPU (set SAGE_TPU_TESTS=1)")
    skip_cpu = pytest.mark.skip(reason="CPU/interpret test, skipped in TPU lane")
    for item in items:
        if "tpu" in item.keywords and not ON_TPU_LANE:
            item.add_marker(skip_tpu)
        elif "tpu" not in item.keywords and ON_TPU_LANE:
            item.add_marker(skip_cpu)
