"""Module-level API-surface parity with the reference package.

Every public function/class defined at module level in the reference's
noisy_src/*.py must be importable from our same-named shim module, and the
behavioral adapters must actually work (not just exist).
"""

import ast
import importlib
import os
from pathlib import Path

import jax
import numpy as np
import pytest

REF = Path("/root/reference/noisy_src")


@pytest.mark.skipif(not REF.exists(), reason="reference tree not present")
def test_every_reference_symbol_importable():
    """AST-walk each reference module; assert our shim exposes each public
    top-level function/class name."""
    missing = {}
    for fname in sorted(os.listdir(REF)):
        if not fname.endswith(".py") or fname == "__init__.py":
            continue
        mod = fname[:-3]
        tree = ast.parse((REF / fname).read_text())
        pub = [
            n.name
            for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.ClassDef))
            and not n.name.startswith("_")
        ]
        ours = importlib.import_module(f"noisy_src.{mod}")
        miss = [s for s in pub if not hasattr(ours, s)]
        if miss:
            missing[mod] = miss
    assert not missing, f"shim modules missing reference symbols: {missing}"


class TestNoiseHelpers:
    def test_set_noise_seed_reproducible(self):
        from noisy_src.noise import add_noise_to_pose, set_noise_seed

        pose = np.eye(4, dtype=np.float32)
        set_noise_seed(7)
        a, _ = add_noise_to_pose(pose, rotation_noise_deg=3.0,
                                 translation_noise=0.1)
        set_noise_seed(7)
        b, _ = add_noise_to_pose(pose, rotation_noise_deg=3.0,
                                 translation_noise=0.1)
        np.testing.assert_array_equal(a, b)

    def test_set_noise_seed_governs_add_noise_to_poses(self, tiny_scene):
        """The batch entry point (seed=None in NoiseConfig) must consume
        the module default stream set_noise_seed controls — the
        reference's global-seed contract (noise.py:65-68)."""
        from noisy_src.noise import (
            NoiseConfig,
            add_noise_to_poses,
            set_noise_seed,
        )

        nc = NoiseConfig(rotation_noise_deg=2.0)   # seed=None
        set_noise_seed(11)
        a, _ = add_noise_to_poses(tiny_scene.poses, nc)
        set_noise_seed(11)
        b, _ = add_noise_to_poses(tiny_scene.poses, nc)
        np.testing.assert_array_equal(a, b)
        # an explicit NoiseConfig.seed still wins over the global stream
        nc_seeded = NoiseConfig(rotation_noise_deg=2.0, seed=3)
        c, _ = add_noise_to_poses(tiny_scene.poses, nc_seeded)
        d, _ = add_noise_to_poses(tiny_scene.poses, nc_seeded)
        np.testing.assert_array_equal(c, d)

    def test_compat_set_seed_seeds_noise_stream(self):
        """Reference-ported scripts call train.set_seed(seed) and expect
        subsequent pose noise to be reproducible (train.py:36-42)."""
        from noisy_src.noise import add_noise_to_pose
        from noisy_src.train import set_seed

        pose = np.eye(4, dtype=np.float32)
        set_seed(42)
        a, _ = add_noise_to_pose(pose, rotation_noise_deg=2.0)
        set_seed(42)
        b, _ = add_noise_to_pose(pose, rotation_noise_deg=2.0)
        np.testing.assert_array_equal(a, b)

    def test_random_translation(self):
        from noisy_src.noise import random_translation

        np.testing.assert_array_equal(random_translation(0.0), np.zeros(3))
        rng = np.random.default_rng(0)
        t = np.stack([random_translation(0.5, rng) for _ in range(2000)])
        assert abs(t.std() - 0.5) < 0.05


class TestPixelBatch:
    def test_attribute_and_dict_access(self, tiny_scene):
        from noisy_src.data_pose_opt import (
            PixelBatch,
            PixelDataset,
            PixelSampler,
        )

        sampler = PixelSampler(PixelDataset(tiny_scene), batch_size=16)
        b = sampler.sample_batch()
        assert isinstance(b, PixelBatch)
        assert b.image_indices.shape == (16,)
        assert b.pixel_coords.shape == (16, 2)
        assert b.target_rgb.shape == (16, 3)
        # dict-style access keeps working, incl. the bank key names
        np.testing.assert_array_equal(
            np.asarray(b["us"]), np.asarray(b.pixel_coords[:, 0])
        )
        np.testing.assert_array_equal(
            np.asarray(b["image_indices"]), np.asarray(b.image_indices)
        )
        with pytest.raises(KeyError):
            b["nonexistent"]

    def test_pixel_batch_is_a_pytree(self, tiny_scene):
        """tree_map and jit must see the three array leaves, like the dict
        it replaced."""
        import jax.numpy as jnp

        from noisy_src.data_pose_opt import PixelDataset, PixelSampler

        sampler = PixelSampler(PixelDataset(tiny_scene), batch_size=16)
        b = sampler.sample_batch()
        halved = jax.tree_util.tree_map(lambda x: x[:8], b)
        assert halved.image_indices.shape == (8,)
        assert halved.pixel_coords.shape == (8, 2)

        @jax.jit
        def mean_rgb(batch):
            return jnp.mean(batch.target_rgb)

        assert np.isfinite(float(mean_rgb(b)))


class TestCameraPoseParameters:
    def test_identity_deltas_return_initial(self, tiny_scene):
        from noisy_src.train_pose_opt import CameraPoseParameters

        cam = CameraPoseParameters(tiny_scene.poses)
        np.testing.assert_allclose(
            np.asarray(cam.get_all_poses()), np.asarray(tiny_scene.poses),
            atol=1e-6,
        )

    def test_compute_pose_errors_keys(self, tiny_scene):
        from noisy_src.noise import NoiseConfig, add_noise_to_poses
        from noisy_src.train_pose_opt import CameraPoseParameters

        noisy, _ = add_noise_to_poses(
            tiny_scene.poses, NoiseConfig(rotation_noise_deg=2.0, seed=0)
        )
        cam = CameraPoseParameters(noisy)
        stats = cam.compute_pose_errors(tiny_scene.poses)
        assert set(stats) == {
            "rotation_error_mean", "rotation_error_std", "rotation_error_max",
            "translation_error_mean", "translation_error_std",
            "translation_error_max",
        }
        assert stats["rotation_error_mean"] > 0.5

    def test_learn_flags_freeze_components(self, tiny_scene):
        import jax.numpy as jnp

        from noisy_src.train_pose_opt import CameraPoseParameters

        cam = CameraPoseParameters(tiny_scene.poses, learn_rotation=False)
        cam.translation_deltas = jnp.ones_like(cam.translation_deltas) * 0.1
        cam.rotation_deltas = jnp.ones_like(cam.rotation_deltas) * 0.5
        poses = np.asarray(cam.get_all_poses())
        # rotation frozen -> rotation part unchanged; translation moved
        np.testing.assert_allclose(
            poses[:, :3, :3], np.asarray(tiny_scene.poses)[:, :3, :3],
            atol=1e-6,
        )
        assert np.max(np.abs(
            poses[:, :3, 3] - np.asarray(tiny_scene.poses)[:, :3, 3]
        )) > 0.05

    def test_subset_indices(self, tiny_scene):
        from noisy_src.train_pose_opt import CameraPoseParameters

        cam = CameraPoseParameters(tiny_scene.poses)
        sub = cam.get_poses(indices=np.array([0, 2]))
        assert np.asarray(sub).shape == (2, 4, 4)


class TestTrainStepAdapters:
    def test_train_step_one_iteration(self, tiny_scene, tiny_config):
        from noisy_src.train import train_step
        from robust_nerf_tpu.data.banks import build_ray_bank
        from robust_nerf_tpu.training.steps import create_train_state

        bank, _, _ = build_ray_bank(tiny_scene)
        state = create_train_state(jax.random.PRNGKey(0), tiny_config)
        new_state, m = train_step(state, bank, jax.random.PRNGKey(1),
                                  tiny_config)
        assert int(new_state.step) == 1
        assert np.isfinite(m["loss"]) and m["loss"] > 0
        assert {"loss_coarse", "psnr", "learning_rate"} <= set(m)
        # the caller's input state must stay usable after the call (the
        # production chunk donates its input buffers; the compat adapter
        # shields the caller — reference train_step leaves objects alive)
        assert int(state.step) == 0
        s2, _ = train_step(state, bank, jax.random.PRNGKey(2), tiny_config)
        assert int(s2.step) == 1

    def test_train_step_with_poses_one_iteration(self, tiny_scene,
                                                 tiny_config):
        import copy

        from noisy_src.train_pose_opt import train_step_with_poses
        from robust_nerf_tpu.config import PoseOptConfig
        from robust_nerf_tpu.data.banks import build_pixel_bank
        from robust_nerf_tpu.training.steps import create_pose_opt_state

        cfg = copy.deepcopy(tiny_config)
        cfg.pose_opt = PoseOptConfig(pose_opt_delay=0)
        bank = build_pixel_bank(tiny_scene)
        state = create_pose_opt_state(
            jax.random.PRNGKey(0), cfg, np.asarray(tiny_scene.poses)
        )
        new_state, m = train_step_with_poses(
            state, bank, jax.random.PRNGKey(1), cfg
        )
        assert int(new_state.step) == 1
        assert np.isfinite(m["loss"])
        assert "pose_reg_loss" in m


class TestInferenceAdapters:
    def test_render_image_reference_signature(self, tiny_scene):
        from noisy_src.inference import render_image
        from noisy_src.rendering import NeRFRenderer
        from robust_nerf_tpu.config import ModelConfig, RenderConfig
        from noisy_src.compat import NeRF

        mc = ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                         num_hidden_layers=2, skips=(1,))
        renderer = NeRFRenderer(
            NeRF(mc, jax.random.PRNGKey(0)), NeRF(mc, jax.random.PRNGKey(1)),
            RenderConfig(num_samples=8, num_samples_fine=8),
        )
        out = render_image(
            renderer, np.asarray(tiny_scene.poses[0]),
            tiny_scene.H, tiny_scene.W, tiny_scene.focal, chunk_size=128,
        )
        assert out["rgb"].shape == (tiny_scene.H, tiny_scene.W, 3)
        assert out["depth"].shape == (tiny_scene.H, tiny_scene.W)

    def test_render_image_with_pose(self, tiny_scene):
        from noisy_src.train_pose_opt import render_image_with_pose
        from noisy_src.compat import NeRF
        from robust_nerf_tpu.config import ModelConfig, RenderConfig

        mc = ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                         num_hidden_layers=2, skips=(1,))
        out = render_image_with_pose(
            NeRF(mc, jax.random.PRNGKey(0)), None,
            np.asarray(tiny_scene.poses[0]),
            tiny_scene.H, tiny_scene.W, tiny_scene.focal,
            RenderConfig(num_samples=8, use_hierarchical=False),
            chunk_size=128,
        )
        assert out["rgb"].shape == (tiny_scene.H, tiny_scene.W, 3)

    def test_render_image_with_pose_mixed_kinds(self, tiny_scene):
        """Wrapper coarse + raw-pytree fine (and vice versa) must work;
        the wrapper's config pins the architecture for the raw one."""
        from noisy_src.train_pose_opt import render_image_with_pose
        from noisy_src.compat import NeRF
        from robust_nerf_tpu.config import ModelConfig, RenderConfig
        from robust_nerf_tpu.models.nerf import init_nerf_params

        mc = ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                         num_hidden_layers=2, skips=(1,))
        rc = RenderConfig(num_samples=4, num_samples_fine=4)
        raw_fine = init_nerf_params(jax.random.PRNGKey(1), mc)
        out = render_image_with_pose(
            NeRF(mc, jax.random.PRNGKey(0)), raw_fine,
            np.asarray(tiny_scene.poses[0]),
            tiny_scene.H, tiny_scene.W, tiny_scene.focal, rc,
            chunk_size=128,
        )
        assert out["rgb"].shape == (tiny_scene.H, tiny_scene.W, 3)
        # raw coarse + wrapper fine: config comes from the fine wrapper
        out2 = render_image_with_pose(
            init_nerf_params(jax.random.PRNGKey(2), mc),
            NeRF(mc, jax.random.PRNGKey(3)),
            np.asarray(tiny_scene.poses[0]),
            tiny_scene.H, tiny_scene.W, tiny_scene.focal, rc,
            chunk_size=128,
        )
        assert out2["rgb"].shape == (tiny_scene.H, tiny_scene.W, 3)
        # raw-only non-default architecture via explicit model_config
        out3 = render_image_with_pose(
            init_nerf_params(jax.random.PRNGKey(4), mc), None,
            np.asarray(tiny_scene.poses[0]),
            tiny_scene.H, tiny_scene.W, tiny_scene.focal,
            RenderConfig(num_samples=4, use_hierarchical=False),
            chunk_size=128, model_config=mc,
        )
        assert out3["rgb"].shape == (tiny_scene.H, tiny_scene.W, 3)

    def test_save_image_and_folder_name(self, tmp_path):
        from noisy_src.inference import (
            generate_output_folder_name,
            save_image,
        )
        from noisy_src.noise import NoiseConfig

        save_image(np.random.rand(4, 4, 3).astype(np.float32),
                   tmp_path / "x.png")
        assert (tmp_path / "x.png").exists()
        name = generate_output_folder_name(
            "test", NoiseConfig(rotation_noise_deg=1.0), "lego"
        )
        assert name.startswith("test_lego_rot1.0deg_")


class TestVisualizeHelpers:
    @pytest.fixture(scope="class")
    def run_dir(self, tmp_path_factory):
        from robust_nerf_tpu.training.train import main

        out = tmp_path_factory.mktemp("viz_run")
        main([
            "--data_source", "synthetic", "--num_iters", "20",
            "--val_every", "20", "--save_every", "20", "--log_every", "10",
            "--batch_size", "64", "--num_samples", "4",
            "--num_samples_fine", "4", "--steps_per_scan", "10",
            "--output_dir", str(out), "--exp_name", "run",
        ])
        return out / "run"

    def test_loaders(self, run_dir):
        from noisy_src.visualize import (
            check_dependencies,
            load_summary,
            load_training_logs,
            load_validation_logs,
        )

        check_dependencies()
        df = load_training_logs(run_dir)
        assert "loss" in df.columns and len(df) == 20
        dv = load_validation_logs(run_dir)
        assert "psnr" in dv.columns
        summary = load_summary(run_dir)
        assert "final_val_psnr" in summary or len(summary) > 0

    def test_loaders_raise_on_missing(self, tmp_path):
        from noisy_src.visualize import load_summary, load_training_logs

        with pytest.raises(FileNotFoundError):
            load_training_logs(tmp_path)
        with pytest.raises(FileNotFoundError):
            load_summary(tmp_path)

    def test_create_report_figures(self, run_dir):
        from noisy_src.visualize import create_report_figures

        fig_dir = create_report_figures(run_dir)
        assert (fig_dir / "training_curves.png").exists()
        assert (fig_dir / "validation_curves.png").exists()
        # standard run: no pose_errors.csv, silently skipped
        assert not (fig_dir / "pose_errors.png").exists()

    def test_create_report_figures_warns_on_missing_logs(self, tmp_path,
                                                         capsys):
        """An empty run dir must WARN about the mandatory figures, not
        silently return an empty figures/ (reference warns and continues,
        visualize.py:410-428)."""
        from noisy_src.visualize import create_report_figures

        create_report_figures(tmp_path)
        outerr = capsys.readouterr()
        assert "training_curves.png" in outerr.out
        assert "Warning" in outerr.out

    def test_create_comparison_plot(self, run_dir, tmp_path):
        from noisy_src.logger import create_comparison_plot

        out = tmp_path / "cmp.png"
        create_comparison_plot([run_dir], metric="psnr", output_path=out)
        assert out.exists()
        out2 = tmp_path / "cmp_loss.png"
        create_comparison_plot([run_dir], metric="loss", output_path=out2)
        assert out2.exists()
