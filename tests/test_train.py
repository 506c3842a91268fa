"""Training-path tests — convergence, checkpoint roundtrip, resume, CLI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_nerf_tpu.config import config_to_dict
from robust_nerf_tpu.data.banks import build_ray_bank
from robust_nerf_tpu.training.checkpoints import (
    find_checkpoint,
    load_checkpoint_raw,
    restore_into,
    save_checkpoint,
)
from robust_nerf_tpu.training.steps import create_train_state, make_train_chunk


@pytest.fixture(scope="module")
def trained(tiny_scene, tiny_config):
    """Train 120 steps on the tiny scene once, share across tests."""
    import tests.conftest  # noqa: F401

    cfg = tiny_config
    bank, _, _ = build_ray_bank(tiny_scene)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    chunk = make_train_chunk(cfg, steps=20)
    first_loss = None
    for _ in range(6):
        state, m = chunk(state, bank, jax.random.PRNGKey(1))
        if first_loss is None:
            first_loss = float(m["loss"][0])
    return state, first_loss, float(m["loss"][-1]), cfg


class TestConvergence:
    def test_loss_decreases(self, trained):
        _, first, last, _ = trained
        assert last < first * 0.5, f"loss {first} -> {last}: not converging"

    def test_metrics_finite(self, trained):
        state, _, last, _ = trained
        assert np.isfinite(last)
        for leaf in jax.tree_util.tree_leaves(state.models):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_step_counter(self, trained):
        state, _, _, _ = trained
        assert int(state.step) == 120


class TestSeedRobustness:
    """The density head must not die on any seed (the reference's ReLU
    collapses irreversibly on some inits; softplus default must not)."""

    @pytest.mark.parametrize("seed", [0, 42, 123])
    def test_converges(self, tiny_scene, tiny_config, seed):
        bank, _, _ = build_ray_bank(tiny_scene)
        state = create_train_state(jax.random.PRNGKey(seed), tiny_config)
        chunk = make_train_chunk(tiny_config, steps=20)
        for _ in range(4):
            state, m = chunk(state, bank, jax.random.PRNGKey(seed + 1))
        # the ReLU-collapse failure mode plateaus at ~0.39 (all-white);
        # any healthy init is far below that by 80 steps
        assert float(m["loss"][-1]) < 0.2


class TestCheckpoint:
    def test_roundtrip(self, trained, tmp_path):
        state, _, _, cfg = trained
        save_checkpoint(tmp_path, 120, state, config_to_dict(cfg))
        assert (tmp_path / "checkpoint_0000120.npz").exists()
        assert (tmp_path / "checkpoint_latest.npz").exists()

        leaves, meta, _ = load_checkpoint_raw(find_checkpoint(tmp_path))
        assert meta["iteration"] == 120
        template = create_train_state(jax.random.PRNGKey(99), cfg)
        restored = restore_into(template, leaves)
        for a, b in zip(
            jax.tree_util.tree_leaves(state.models),
            jax.tree_util.tree_leaves(restored.models),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == 120

    def test_best_checkpoint(self, trained, tmp_path):
        state, _, _, cfg = trained
        save_checkpoint(tmp_path, 1, state, config_to_dict(cfg), is_best=True)
        assert (tmp_path / "checkpoint_best.npz").exists()

    def test_orbax_backend_roundtrip(self, trained, tmp_path):
        """--ckpt_backend orbax: same naming convention (.orbax dirs +
        latest/best symlinks), transparently loadable by find_checkpoint /
        load_checkpoint_raw (VERDICT round-1 item 9)."""
        state, _, _, cfg = trained
        save_checkpoint(
            tmp_path, 120, state, config_to_dict(cfg),
            metrics={"val_psnr": 20.0},
            is_best=True,
            extra_arrays={"initial_poses": np.eye(4, dtype=np.float32)[None]},
            backend="orbax",
        )
        assert (tmp_path / "checkpoint_0000120.orbax").is_dir()
        assert (tmp_path / "checkpoint_latest.orbax").exists()
        assert (tmp_path / "checkpoint_best.orbax").exists()

        leaves, meta, extra = load_checkpoint_raw(find_checkpoint(tmp_path))
        assert meta["iteration"] == 120
        assert meta["metrics"]["val_psnr"] == 20.0
        assert "initial_poses" in extra
        template = create_train_state(jax.random.PRNGKey(99), cfg)
        restored = restore_into(template, leaves)
        for a, b in zip(
            jax.tree_util.tree_leaves(state.models),
            jax.tree_util.tree_leaves(restored.models),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == 120

    def test_orbax_async_backend(self, trained, tmp_path):
        """--ckpt_backend orbax_async: disk write overlaps training; the
        latest/best pointers + meta.json are only published once the data
        commit finishes (finalize before next save / at run end)."""
        from robust_nerf_tpu.training.checkpoints import finalize_checkpoints

        state, _, _, cfg = trained
        save_checkpoint(
            tmp_path, 60, state, config_to_dict(cfg), backend="orbax_async"
        )
        # second save finalizes the first; explicit flush finalizes the last
        save_checkpoint(
            tmp_path, 120, state, config_to_dict(cfg),
            metrics={"val_psnr": 21.0}, is_best=True, backend="orbax_async",
        )
        finalize_checkpoints()
        finalize_checkpoints()   # idempotent
        assert (tmp_path / "checkpoint_0000060.orbax" / "meta.json").exists()
        assert (tmp_path / "checkpoint_0000120.orbax" / "meta.json").exists()
        assert (tmp_path / "checkpoint_best.orbax").exists()

        leaves, meta, _ = load_checkpoint_raw(find_checkpoint(tmp_path))
        assert meta["iteration"] == 120
        template = create_train_state(jax.random.PRNGKey(99), cfg)
        restored = restore_into(template, leaves)
        for a, b in zip(
            jax.tree_util.tree_leaves(state.models),
            jax.tree_util.tree_leaves(restored.models),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_leaf_mismatch_raises(self, trained, tmp_path):
        from robust_nerf_tpu.config import NeRFConfig, RenderConfig

        state, _, _, cfg = trained
        save_checkpoint(tmp_path, 1, state, config_to_dict(cfg))
        leaves, _, _ = load_checkpoint_raw(find_checkpoint(tmp_path))
        bad_cfg = NeRFConfig(render=RenderConfig(use_hierarchical=False))
        template = create_train_state(jax.random.PRNGKey(0), bad_cfg)
        with pytest.raises(ValueError, match="leaves"):
            restore_into(template, leaves)

    def test_resume_continues(self, trained, tmp_path):
        """Resumed training must keep improving from restored state."""
        state, _, last_loss, cfg = trained
        save_checkpoint(tmp_path, 120, state, config_to_dict(cfg))
        leaves, meta, _ = load_checkpoint_raw(find_checkpoint(tmp_path))
        template = create_train_state(jax.random.PRNGKey(5), cfg)
        restored = restore_into(template, leaves)

        from robust_nerf_tpu.data.synthetic import load_scene

        scene = load_scene(cfg.data, "train")
        bank, _, _ = build_ray_bank(scene)
        chunk = make_train_chunk(cfg, steps=20)
        restored, m = chunk(restored, bank, jax.random.PRNGKey(1))
        assert float(m["loss"][-1]) < last_loss * 3  # no blow-up after resume


class TestTrainCLI:
    def test_full_train_entry(self, tmp_path):
        """Drive the real train() orchestrator end to end on a tiny config."""
        from robust_nerf_tpu.training.train import main

        main([
            "--data_source", "synthetic", "--num_iters", "40",
            "--val_every", "40", "--save_every", "40", "--log_every", "20",
            "--batch_size", "128", "--num_samples", "8",
            "--num_samples_fine", "8", "--steps_per_scan", "20",
            "--output_dir", str(tmp_path), "--exp_name", "cli_smoke",
        ])
        out = tmp_path / "cli_smoke"
        assert (out / "summary.json").exists()
        assert (out / "logs" / "train_metrics.csv").exists()
        assert (out / "checkpoint_latest.npz").exists()
        import csv

        with open(out / "logs" / "train_metrics.csv") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 40                      # one row per iteration
        assert rows[0]["iteration"] == "0"
        assert set(rows[0].keys()) >= {
            "iteration", "loss", "loss_coarse", "loss_fine", "psnr",
            "learning_rate", "time_per_iter", "rays_per_sec",
        }


class TestSyntheticFlags:
    def test_resolution_and_texture_flags(self, tmp_path):
        """--synthetic_resolution/--synthetic_textured reach the data layer."""
        from robust_nerf_tpu.training.train import main

        main([
            "--data_source", "synthetic", "--synthetic_resolution", "16",
            "--synthetic_textured",
            "--num_iters", "4", "--val_every", "4", "--save_every", "4",
            "--log_every", "2", "--batch_size", "64", "--num_samples", "4",
            "--num_samples_fine", "4", "--steps_per_scan", "2",
            "--output_dir", str(tmp_path), "--exp_name", "flags",
        ])
        import json

        with open(tmp_path / "flags" / "config.json") as f:
            cfg = json.load(f)
        assert cfg["data"]["synthetic_resolution"] == 16
        assert cfg["data"]["synthetic_textured"] is True
