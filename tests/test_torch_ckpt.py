"""Checkpoint migration bridge: reference .pt <-> our .npz, validated by
round-tripping through the ACTUAL reference package (same import pattern as
tests/test_reference_parity.py). Covers weight transposition, config
rebuild, Adam-moment import, pose-opt camera params, and that exports load
through the reference's own load_checkpoint."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

REF_ROOT = Path("/root/reference/noisy_src")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not REF_ROOT.exists(), reason="reference checkout not on disk"
)


@pytest.fixture(scope="module")
def ref():
    if "refsrc" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "refsrc",
            REF_ROOT / "__init__.py",
            submodule_search_locations=[str(REF_ROOT)],
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["refsrc"] = mod
        spec.loader.exec_module(mod)
    import refsrc  # noqa: F401
    import refsrc.inference
    import refsrc.train
    import refsrc.train_pose_opt

    pkg = sys.modules["refsrc"]
    # refsrc.train is shadowed by the re-exported train() FUNCTION
    # (reference __init__.py re-exports it); reach the modules directly
    pkg.train_mod = sys.modules["refsrc.train"]
    pkg.train_pose_opt_mod = sys.modules["refsrc.train_pose_opt"]
    pkg.inference_mod = sys.modules["refsrc.inference"]
    return pkg


def _small_ref_config(ref, tmp_path):
    return ref.NeRFConfig(
        model=ref.ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=64,
                              num_hidden_layers=3, skips=(1,)),
        render=ref.RenderConfig(num_samples=8, num_samples_fine=8),
        data=ref.DataConfig(scene_name="lego", batch_size=64),
        train=ref.TrainConfig(output_dir=tmp_path, lr=5e-4),
    )


def _ref_models_with_adam(ref, cfg, steps: int = 2, seed: int = 0):
    """Reference coarse+fine models plus an Adam whose moments are
    populated by a few dummy optimization steps."""
    torch.manual_seed(seed)
    coarse, fine = ref.create_nerf(cfg.model)
    params = list(coarse.parameters()) + list(fine.parameters())
    opt = torch.optim.Adam(params, lr=cfg.train.lr)
    pts = torch.randn(128, 3)
    dirs = torch.nn.functional.normalize(torch.randn(128, 3), dim=-1)
    for _ in range(steps):
        opt.zero_grad()
        loss = 0.0
        for m in (coarse, fine):
            rgb, sigma = m(pts, dirs)
            loss = loss + rgb.square().mean() + sigma.square().mean()
        loss.backward()
        opt.step()
    return coarse, fine, opt


def _find_adam(opt_state):
    import optax

    def rec(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s
        if isinstance(s, tuple) and not hasattr(s, "_fields"):
            for x in s:
                r = rec(x)
                if r is not None:
                    return r
        return None

    found = rec(opt_state)
    assert found is not None, "no ScaleByAdamState in opt_state"
    return found


class TestImportStandard:
    def test_weights_config_and_adam_import(self, ref, tmp_path):
        from robust_nerf_tpu.models.nerf import nerf_apply
        from robust_nerf_tpu.training.steps import TrainState
        from robust_nerf_tpu.utils.torch_ckpt import (
            import_reference_checkpoint,
        )

        cfg_ref = _small_ref_config(ref, tmp_path)
        coarse, fine, opt = _ref_models_with_adam(ref, cfg_ref)
        ref.train_mod.save_checkpoint(
            tmp_path, 123, coarse, fine, opt, cfg_ref,
            metrics={"val_psnr": 20.0},
        )

        state, cfg, meta = import_reference_checkpoint(
            tmp_path / "checkpoint_latest.pt")
        assert isinstance(state, TrainState)
        assert meta["iteration"] == 123 and int(state.step) == 123
        assert cfg.model.hidden_dim == 64 and cfg.model.skips == (1,)
        # reference densities are ReLU'd; our softplus default must NOT leak
        assert cfg.model.sigma_activation == "relu"
        assert meta["metrics"]["val_psnr"] == 20.0

        # forward parity on the imported weights
        rng = np.random.default_rng(1)
        pts = rng.uniform(-2, 2, size=(64, 3)).astype(np.float32)
        dirs = rng.normal(size=(64, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        with torch.no_grad():
            rgb_ref, sigma_ref = coarse(torch.from_numpy(pts),
                                        torch.from_numpy(dirs))
        rgb, sigma = nerf_apply(state.models["coarse"], pts, dirs, cfg.model)
        np.testing.assert_allclose(np.asarray(rgb), rgb_ref.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sigma), sigma_ref.numpy(),
                                   rtol=1e-4, atol=1e-4)

        # Adam moments carried over (weights transpose, so do moments);
        # torch indexes coarse then fine
        adam = _find_adam(state.opt_state)
        assert int(adam.count) == 123
        t_state = opt.state_dict()["state"]
        np.testing.assert_allclose(
            np.asarray(adam.mu["coarse"]["trunk_0_w"]),
            t_state[0]["exp_avg"].numpy().T, rtol=1e-6, atol=1e-7)
        n_per_model = len(t_state) // 2
        np.testing.assert_allclose(
            np.asarray(adam.nu["fine"]["trunk_0_w"]),
            t_state[n_per_model]["exp_avg_sq"].numpy().T,
            rtol=1e-6, atol=1e-9)

    def test_fresh_optimizer_flag(self, ref, tmp_path):
        from robust_nerf_tpu.utils.torch_ckpt import (
            import_reference_checkpoint,
        )

        cfg_ref = _small_ref_config(ref, tmp_path)
        coarse, fine, opt = _ref_models_with_adam(ref, cfg_ref, steps=1)
        ref.train_mod.save_checkpoint(tmp_path, 50, coarse, fine, opt, cfg_ref)
        state, _, _ = import_reference_checkpoint(
            tmp_path / "checkpoint_latest.pt", import_optimizer=False)
        adam = _find_adam(state.opt_state)
        # moments zeroed, but the count still resumes the LR schedule
        assert int(adam.count) == 50
        assert float(np.abs(np.asarray(
            adam.mu["coarse"]["trunk_0_w"])).max()) == 0.0

    def test_imported_checkpoint_serves_inference(self, ref, tmp_path):
        """Import -> save as OUR npz -> evalx.load_checkpoint -> render."""
        from robust_nerf_tpu.evalx.inference import load_checkpoint
        from robust_nerf_tpu.ops.rendering import render_image
        from robust_nerf_tpu.utils.torch_ckpt import (
            import_reference_checkpoint,
            save_imported_checkpoint,
        )

        cfg_ref = _small_ref_config(ref, tmp_path / "ref")
        (tmp_path / "ref").mkdir()
        coarse, fine, opt = _ref_models_with_adam(ref, cfg_ref, steps=1)
        ref.train_mod.save_checkpoint(tmp_path / "ref", 10, coarse, fine, opt,
                                  cfg_ref)
        state, cfg, meta = import_reference_checkpoint(
            tmp_path / "ref" / "checkpoint_latest.pt")
        save_imported_checkpoint(tmp_path / "imported", state, cfg, meta)

        models, cfg2, meta2, extra = load_checkpoint(tmp_path / "imported")
        assert meta2["iteration"] == 10 and not extra
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 4.0
        out = render_image(models, pose, 8, 8, 10.0, cfg2.render, cfg2.model)
        assert np.isfinite(np.asarray(out["rgb"])).all()


class TestImportPoseOpt:
    def _ref_pose_opt_ckpt(self, ref, tmp_path, n_poses=3):
        torch.manual_seed(7)
        cfg_ref = _small_ref_config(ref, tmp_path)
        coarse, fine, opt_nerf = _ref_models_with_adam(ref, cfg_ref, steps=1)
        poses = torch.eye(4).repeat(n_poses, 1, 1)
        poses[:, :3, 3] = torch.randn(n_poses, 3)
        cam = ref.train_pose_opt_mod.CameraPoseParameters(poses)
        opt_poses = torch.optim.Adam(cam.parameters(), lr=1e-4)
        # nonzero deltas up front: at delta=0 the reference's small-angle
        # exp-map guard (train_pose_opt.py:122-163) zeroes the rotation
        # gradient, so a gradient step alone would leave rotations at 0
        with torch.no_grad():
            cam.rotation_deltas += 0.02 * torch.randn(n_poses, 3)
            cam.translation_deltas += 0.01 * torch.randn(n_poses, 3)
        # one weighted step so the Adam moments are populated too
        # (sum(poses**2) would also be degenerate: the squared Frobenius
        # norm of a rotation block is identically 3)
        w = torch.randn(poses.shape)
        loss = (cam.get_all_poses() * w).sum()
        loss.backward()
        opt_poses.step()
        ref.train_pose_opt_mod.save_checkpoint_with_poses(
            tmp_path, 77, coarse, fine, cam, opt_nerf, opt_poses, cfg_ref,
            pose_errors={"rotation_error_mean": 1.5},
        )
        return cam, opt_poses

    def test_pose_state_and_current_poses_match(self, ref, tmp_path):
        from robust_nerf_tpu.training.steps import (
            PoseOptState,
            current_poses,
        )
        from robust_nerf_tpu.utils.torch_ckpt import (
            import_reference_checkpoint,
        )

        cam, opt_poses = self._ref_pose_opt_ckpt(ref, tmp_path)
        state, cfg, meta = import_reference_checkpoint(
            tmp_path / "checkpoint_latest.pt")
        assert isinstance(state, PoseOptState)
        assert cfg.pose_opt is not None
        assert float(np.abs(np.asarray(
            state.pose_params["rotation_deltas"])).max()) > 0.0

        # composed poses agree through BOTH exp-map implementations
        with torch.no_grad():
            poses_ref = cam.get_all_poses().numpy()
        np.testing.assert_allclose(
            np.asarray(current_poses(state)), poses_ref, atol=1e-5)

        # pose Adam moments imported (both deltas learnable)
        adam = _find_adam(state.pose_opt_state)
        t_state = opt_poses.state_dict()["state"]
        np.testing.assert_allclose(
            np.asarray(adam.mu["rotation_deltas"]),
            t_state[0]["exp_avg"].numpy(), rtol=1e-6, atol=1e-8)

        # our extra-array contract so inference detects a pose-opt run
        assert "initial_poses" in meta["extra_arrays"]
        assert "current_poses" in meta["extra_arrays"]
        assert meta["metrics"]["pose_errors"]["rotation_error_mean"] == 1.5


class TestExport:
    def _our_run(self, tmp_path, pose_opt=False):
        import dataclasses

        import jax

        from robust_nerf_tpu.config import (
            ModelConfig,
            NeRFConfig,
            PoseOptConfig,
            RenderConfig,
            config_to_dict,
        )
        from robust_nerf_tpu.training.checkpoints import save_checkpoint
        from robust_nerf_tpu.training.steps import (
            create_pose_opt_state,
            create_train_state,
        )

        cfg = NeRFConfig(
            model=ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=64,
                              num_hidden_layers=3, skips=(1,),
                              sigma_activation="relu"),
            render=RenderConfig(num_samples=8, num_samples_fine=8),
            pose_opt=PoseOptConfig() if pose_opt else None,
        )
        key = jax.random.PRNGKey(3)
        extra = None
        if pose_opt:
            rng = np.random.default_rng(0)
            init = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
            init[:, :3, 3] = rng.normal(size=(3, 3)).astype(np.float32)
            state = create_pose_opt_state(key, cfg, init)
            state = state._replace(pose_params={
                "rotation_deltas": 0.01 * np.ones((3, 3), np.float32),
                "translation_deltas": 0.02 * np.ones((3, 3), np.float32),
            })
            extra = {"initial_poses": init}
        else:
            state = create_train_state(key, cfg)
        save_checkpoint(tmp_path, 7, state, config_to_dict(cfg),
                        extra_arrays=extra)
        return state, cfg

    def test_export_loads_through_reference(self, ref, tmp_path):
        from robust_nerf_tpu.models.nerf import nerf_apply
        from robust_nerf_tpu.utils.torch_ckpt import (
            export_reference_checkpoint,
        )

        state, cfg = self._our_run(tmp_path)
        pt = export_reference_checkpoint(tmp_path, tmp_path / "export.pt")

        renderer, ref_cfg, iteration = ref.inference_mod.load_checkpoint(
            pt, device="cpu")
        assert iteration == 7
        assert ref_cfg["model"]["hidden_dim"] == 64
        assert "sigma_activation" not in ref_cfg["model"]

        rng = np.random.default_rng(2)
        pts = rng.uniform(-2, 2, size=(64, 3)).astype(np.float32)
        dirs = rng.normal(size=(64, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        with torch.no_grad():
            rgb_ref, sigma_ref = renderer.model_coarse(
                torch.from_numpy(pts), torch.from_numpy(dirs))
        rgb, sigma = nerf_apply(state.models["coarse"], pts, dirs, cfg.model)
        np.testing.assert_allclose(np.asarray(rgb), rgb_ref.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sigma), sigma_ref.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_export_pose_opt_carries_camera_params(self, ref, tmp_path):
        from robust_nerf_tpu.utils.torch_ckpt import (
            export_reference_checkpoint,
        )

        state, cfg = self._our_run(tmp_path, pose_opt=True)
        pt = export_reference_checkpoint(tmp_path, tmp_path / "export.pt")
        ckpt = torch.load(pt, map_location="cpu", weights_only=True)
        assert "camera_params" in ckpt and "initial_poses" in ckpt
        np.testing.assert_allclose(
            ckpt["camera_params"]["rotation_deltas"].numpy(),
            np.asarray(state.pose_params["rotation_deltas"]), atol=0)
        # the state dict drops straight into the reference module
        cam = ref.train_pose_opt_mod.CameraPoseParameters(
            ckpt["initial_poses"])
        cam.load_state_dict(ckpt["camera_params"])
        assert np.isfinite(cam.get_all_poses().detach().numpy()).all()


class TestReferenceArtifacts:
    """Cross-validate OUR pose-error math against the reference's REAL
    committed artifacts: every final_poses.pt bundle in the reference's
    outputs/ records the errors the reference computed at run end
    (train_pose_opt.py:232-271, 1036-1043); recomputing them from the
    bundled pose arrays with our compute_pose_error must reproduce the
    recorded numbers."""

    def test_final_poses_bundles_reproduce_recorded_errors(self):
        from robust_nerf_tpu.core.noise import compute_pose_error

        bundles = sorted(
            Path("/root/reference/outputs").glob("*/final_poses.pt"))
        if not bundles:
            pytest.skip("no final_poses.pt artifacts in the reference")
        checked = 0
        for path in bundles:
            d = torch.load(path, map_location="cpu", weights_only=True)
            opt = d["optimized_poses"].detach().numpy()
            gt = d["ground_truth_poses"].detach().numpy()
            rec = d["pose_errors"]
            rots, trans = [], []
            for i in range(gt.shape[0]):
                e = compute_pose_error(gt[i], opt[i])
                rots.append(e["rotation_error_deg"])
                trans.append(e["translation_error"])
            # atol 5e-3 deg: the reference computed arccos in f32, which
            # is ill-conditioned for the clean-init run's ~0.01 deg errors
            np.testing.assert_allclose(
                np.mean(rots), rec["rotation_error_mean"], rtol=1e-3,
                atol=5e-3, err_msg=str(path))
            np.testing.assert_allclose(
                np.max(rots), rec["rotation_error_max"], rtol=1e-3,
                atol=5e-3, err_msg=str(path))
            np.testing.assert_allclose(
                np.mean(trans), rec["translation_error_mean"], rtol=1e-3,
                err_msg=str(path))
            np.testing.assert_allclose(
                np.std(rots), rec["rotation_error_std"], rtol=1e-2,
                atol=5e-3, err_msg=str(path))
            checked += 1
        assert checked >= 5  # the reference commits >= 5 pose-opt runs
