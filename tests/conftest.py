"""Test harness: force CPU backend with 8 virtual devices BEFORE jax init.

This is the fake-multi-chip substitute for a TPU pod (SURVEY.md §4): every
sharding test runs against a real 8-device jax.sharding.Mesh backed by
virtual CPU devices.

Exception: ROBUST_NERF_TPU_TESTS=1 keeps the REAL chip visible for the
`tpu`-marked on-chip suite (VERDICT r4 #7):

    ROBUST_NERF_TPU_TESTS=1 python -m pytest -m tpu tests/

Default runs deselect those tests (pytest.ini addopts) and force CPU.
"""

import os

_ON_CHIP = os.environ.get("ROBUST_NERF_TPU_TESTS") == "1"

if not _ON_CHIP:
    # This container's sitecustomize registers the TPU PJRT plugin at
    # interpreter startup (PALLAS_AXON_POOL_IPS), so env vars alone are too
    # late here — switch the platform through jax.config and rebuild backends.
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
# "auto" compile-cache mode is disabled on the CPU backend these tests
# force (utils/compile_cache.py), but keep any stray persistence out of
# ~/.cache anyway so test runs stay hermetic.
os.environ.setdefault("ROBUST_NERF_COMPILE_CACHE", "/tmp/rn_test_xla_cache")

import jax  # noqa: E402
import pytest  # noqa: E402

if not _ON_CHIP:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    try:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
    except Exception:
        pass

    assert jax.default_backend() == "cpu", (
        "tests must run on CPU; conftest failed to override the TPU plugin"
    )
    assert jax.device_count() >= 8, "expected 8 virtual CPU devices"


@pytest.fixture(scope="session")
def tiny_scene():
    """Small procedural scene shared across tests (8 imgs, 24x24)."""
    from robust_nerf_tpu.data.synthetic import make_synthetic_scene

    return make_synthetic_scene(num_images=8, resolution=24, num_samples=128)


@pytest.fixture(scope="session")
def tiny_val_scene():
    from robust_nerf_tpu.data.synthetic import make_synthetic_scene

    return make_synthetic_scene(num_images=2, resolution=24, split="val", num_samples=128)


@pytest.fixture(scope="session")
def tiny_config():
    """Config small enough for fast CPU training in tests."""
    from robust_nerf_tpu.config import (
        DataConfig,
        ModelConfig,
        NeRFConfig,
        RenderConfig,
        TPUConfig,
        TrainConfig,
    )

    return NeRFConfig(
        model=ModelConfig(pos_freqs=6, dir_freqs=2, hidden_dim=64,
                          num_hidden_layers=4, skips=(2,)),
        render=RenderConfig(num_samples=16, num_samples_fine=16),
        data=DataConfig(batch_size=256, source="synthetic",
                        synthetic_resolution=24, synthetic_num_train=8,
                        synthetic_num_val=2),
        train=TrainConfig(num_iterations=60, log_every=20, val_every=60,
                          save_every=60, seed=0),
        tpu=TPUConfig(steps_per_scan=20, eval_tile=256),
    )


def assert_devices():
    assert jax.device_count() >= 8, (
        f"expected >=8 virtual CPU devices, got {jax.device_count()}"
    )
