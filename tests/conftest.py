"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware; multi-chip sharding is validated on
XLA's host-platform device emulation (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override (the shell presets axon/tpu)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already be imported (the TPU image registers a PJRT plugin via
# sitecustomize), in which case it cached JAX_PLATFORMS at import time;
# config.update still works as long as no backend has been initialized.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_filters():
    """Path to the pretrained filter banks shipped with the reference."""
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference filter banks not available")
    return REFERENCE_ROOT


@pytest.fixture(scope="session")
def filters_2x_highres(reference_filters):
    return str(reference_filters / "filters_2x" / "filters_highres")


@pytest.fixture(scope="session")
def filters_2x_lowres(reference_filters):
    return str(reference_filters / "filters_2x" / "filters_lowres")


@pytest.fixture(scope="session")
def filters_2x_denoise(reference_filters):
    return str(reference_filters / "filters_2x" / "filters_denoise")


@pytest.fixture(scope="session")
def filters_15x_highres(reference_filters):
    return str(reference_filters / "filters_1.5x" / "filters_highres")


@pytest.fixture(scope="session")
def filters_15x_denoise(reference_filters):
    return str(reference_filters / "filters_1.5x" / "filters_denoise")
