"""Gauge anchoring: SIM(3) projection of pose deltas (core/se3.py).

Round-4 fix for VERDICT r3 "What's weak" #1: joint pose+scene optimization
is flat along a global similarity, so the constellation random-walks off
the initial gauge. project_gauge_deltas re-anchors after every update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import robust_nerf_tpu as rn
from robust_nerf_tpu.core.se3 import (
    align_poses_umeyama,
    apply_pose_deltas,
    apply_sim3_inverse_to_poses,
    exp_so3,
    fit_sim3_centers,
    log_so3,
    pose_errors,
    project_gauge_deltas,
)


def _ring_poses(n=12, radius=4.0, seed=0):
    """Cameras on a ring looking at the origin (same rig as the scenes)."""
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(n):
        theta = 2 * np.pi * i / n
        center = np.array(
            [radius * np.cos(theta), radius * np.sin(theta), 1.0 + 0.3 * rng.standard_normal()]
        )
        forward = -center / np.linalg.norm(center)
        right = np.cross(forward, [0.0, 0.0, 1.0])
        right /= np.linalg.norm(right)
        up = np.cross(right, forward)
        pose = np.eye(4)
        pose[:3, 0] = right
        pose[:3, 1] = up
        pose[:3, 2] = -forward  # OpenGL: camera looks down -z
        pose[:3, 3] = center
        poses.append(pose)
    return np.stack(poses).astype(np.float32)


def _apply_gauge(poses, omega, tau, scale):
    """Left-apply a global SIM(3) (exp(omega), tau, scale) to poses."""
    G = np.asarray(exp_so3(jnp.asarray(omega, jnp.float32)))
    out = np.array(poses, copy=True)
    out[:, :3, :3] = np.einsum("ij,njk->nik", G, poses[:, :3, :3])
    out[:, :3, 3] = scale * (G @ poses[:, :3, 3].T).T + tau
    return out


def test_fit_sim3_recovers_injected_transform():
    poses = _ring_poses()
    centers = poses[:, :3, 3]
    omega = np.array([0.02, -0.03, 0.04], np.float32)
    tau = np.array([0.1, -0.2, 0.05], np.float32)
    scale = 1.03
    moved = _apply_gauge(poses, omega, tau, scale)[:, :3, 3]
    s, R, t = fit_sim3_centers(jnp.asarray(centers), jnp.asarray(moved))
    # fitted transform must map centers -> moved exactly (it IS a sim3)
    re = s * jnp.einsum("ij,nj->ni", R, jnp.asarray(centers)) + t
    np.testing.assert_allclose(np.asarray(re), moved, atol=1e-4)
    assert abs(float(s) - scale) < 1e-4
    np.testing.assert_allclose(
        np.asarray(log_so3(R)), omega, atol=1e-4
    )


def test_fit_sim3_no_rotation_mode():
    poses = _ring_poses()
    centers = jnp.asarray(poses[:, :3, 3])
    moved = centers * 1.05 + jnp.array([0.3, 0.0, -0.1])
    s, R, t = fit_sim3_centers(centers, moved, fit_rotation=False)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)
    assert abs(float(s) - 1.05) < 1e-5
    re = s * centers + t
    np.testing.assert_allclose(np.asarray(re), np.asarray(moved), atol=1e-4)


def test_project_gauge_removes_pure_drift():
    """A pure gauge shift on top of per-camera deltas is exactly removed."""
    poses = _ring_poses()
    rng = np.random.default_rng(3)
    rot_d = (0.01 * rng.standard_normal((12, 3))).astype(np.float32)
    trans_d = (0.02 * rng.standard_normal((12, 3))).astype(np.float32)
    # ensure the per-camera deltas themselves carry no gauge component, so
    # the assertion below is exact rather than approximate
    base = project_gauge_deltas(jnp.asarray(poses), jnp.asarray(rot_d),
                                jnp.asarray(trans_d))

    # inject a global drift: compose gauge G onto the based deltas
    omega = np.array([0.03, 0.01, -0.02], np.float32)
    tau = np.array([-0.15, 0.08, 0.1], np.float32)
    scale = 0.97
    cur = apply_pose_deltas(jnp.asarray(poses), base["rotation_deltas"],
                            base["translation_deltas"])
    drifted = _apply_gauge(np.asarray(cur), omega, tau, scale)
    drift_rot = np.asarray(
        log_so3(jnp.einsum("nij,nkj->nik", jnp.asarray(drifted[:, :3, :3]),
                           jnp.asarray(poses[:, :3, :3])))
    )
    drift_trans = drifted[:, :3, 3] - poses[:, :3, 3]

    proj = project_gauge_deltas(
        jnp.asarray(poses), jnp.asarray(drift_rot), jnp.asarray(drift_trans)
    )
    # projection must give back the based (drift-free) deltas
    np.testing.assert_allclose(
        np.asarray(proj["rotation_deltas"]),
        np.asarray(base["rotation_deltas"]), atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(proj["translation_deltas"]),
        np.asarray(base["translation_deltas"]), atol=2e-3,
    )


def test_project_gauge_preserves_relative_poses():
    poses = _ring_poses()
    rng = np.random.default_rng(5)
    rot_d = jnp.asarray(0.05 * rng.standard_normal((12, 3)), jnp.float32)
    trans_d = jnp.asarray(0.1 * rng.standard_normal((12, 3)), jnp.float32)
    before = apply_pose_deltas(jnp.asarray(poses), rot_d, trans_d)
    proj = project_gauge_deltas(jnp.asarray(poses), rot_d, trans_d)
    after = apply_pose_deltas(
        jnp.asarray(poses), proj["rotation_deltas"], proj["translation_deltas"]
    )
    # relative orientations invariant under the global transform
    rel_b = jnp.einsum("ij,njk->nik", jnp.asarray(before)[0, :3, :3].T,
                       jnp.asarray(before)[:, :3, :3])
    rel_a = jnp.einsum("ij,njk->nik", jnp.asarray(after)[0, :3, :3].T,
                       jnp.asarray(after)[:, :3, :3])
    np.testing.assert_allclose(np.asarray(rel_a), np.asarray(rel_b), atol=1e-4)
    # pairwise center distances rescale by one uniform factor
    db = np.linalg.norm(
        np.asarray(before)[:, None, :3, 3] - np.asarray(before)[None, :, :3, 3],
        axis=-1,
    )
    da = np.linalg.norm(
        np.asarray(after)[:, None, :3, 3] - np.asarray(after)[None, :, :3, 3],
        axis=-1,
    )
    mask = db > 1e-6
    ratios = da[mask] / db[mask]
    assert np.ptp(ratios) < 1e-3


def test_apply_sim3_inverse_roundtrip():
    poses = _ring_poses()
    drifted = _apply_gauge(poses, np.array([0.05, -0.02, 0.01], np.float32),
                           np.array([0.2, 0.1, -0.3], np.float32), 1.04)
    aligned, xform = align_poses_umeyama(drifted, poses)
    # aligned ~ GT (pure gauge offset, removable exactly)
    errs = pose_errors(jnp.asarray(aligned), jnp.asarray(poses))
    assert float(errs["mean_rotation_error_deg"]) < 0.01
    # inverse maps GT-gauge poses into the drifted gauge
    back = apply_sim3_inverse_to_poses(poses, xform)
    np.testing.assert_allclose(back[:, :3, 3], drifted[:, :3, 3], atol=1e-3)
    np.testing.assert_allclose(back[:, :3, :3], drifted[:, :3, :3], atol=1e-4)


@pytest.mark.parametrize("anchor", [True, False])
def test_pose_opt_chunk_gauge_anchor_runs(tiny_scene, anchor):
    """The in-step projection compiles, runs, and pins the gauge."""
    from robust_nerf_tpu.core.noise import NoiseConfig, add_noise_to_poses
    from robust_nerf_tpu.data.banks import build_pixel_bank
    from robust_nerf_tpu.training.steps import (
        create_pose_opt_state,
        current_poses,
        make_pose_opt_chunk,
    )

    cfg = rn.NeRFConfig()
    cfg.data.batch_size = 64
    cfg.model = rn.ModelConfig(hidden_dim=16, num_hidden_layers=2,
                               pos_freqs=2, dir_freqs=1, skips=())
    cfg.render = rn.RenderConfig(num_samples=8, num_samples_fine=8)
    cfg.tpu = rn.TPUConfig(steps_per_scan=4)
    cfg.pose_opt = rn.PoseOptConfig(
        pose_opt_delay=0, pose_lr=5e-3, rotation_reg_weight=0.0,
        translation_reg_weight=0.0, gauge_anchor=anchor,
    )
    gt = np.asarray(tiny_scene.poses)
    noisy, _ = add_noise_to_poses(
        gt, NoiseConfig(rotation_noise_deg=3.0, translation_noise_pct=3.0,
                        seed=11),
    )
    bank = build_pixel_bank(tiny_scene)
    state = create_pose_opt_state(jax.random.PRNGKey(0), cfg,
                                  jnp.asarray(noisy))
    chunk = make_pose_opt_chunk(cfg, steps=4)
    state, metrics = chunk(state, bank, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    if anchor:
        # after projection the best-fit sim3 current->init is identity
        cur = np.asarray(current_poses(state))
        s, R, t = fit_sim3_centers(
            jnp.asarray(cur[:, :3, 3]), jnp.asarray(noisy[:, :3, 3])
        )
        assert abs(float(s) - 1.0) < 1e-3
        assert float(jnp.linalg.norm(log_so3(R))) < 1e-3
        assert float(jnp.linalg.norm(t)) < 5e-3


class TestAutoPreset:
    """_maybe_auto_severe (training/train_pose_opt.py): severe noise +
    untouched standard knobs -> severe recipe; anything else untouched."""

    def _cfg(self, **po_kwargs):
        cfg = rn.NeRFConfig()
        cfg.pose_opt = rn.PoseOptConfig(**po_kwargs)
        return cfg

    def test_severe_noise_upgrades_standard_defaults(self):
        from robust_nerf_tpu.core.noise import NoiseConfig
        from robust_nerf_tpu.training.train_pose_opt import (
            SEVERE_RECOVERY_PRESET,
            _maybe_auto_severe,
        )

        cfg = self._cfg()
        _maybe_auto_severe(
            cfg, NoiseConfig(rotation_noise_deg=5.0, translation_noise_pct=5.0)
        )
        for k, v in SEVERE_RECOVERY_PRESET.items():
            assert getattr(cfg.pose_opt, k) == v, k

    def test_mild_noise_keeps_standard(self):
        from robust_nerf_tpu.core.noise import NoiseConfig
        from robust_nerf_tpu.training.train_pose_opt import _maybe_auto_severe

        cfg = self._cfg()
        _maybe_auto_severe(
            cfg, NoiseConfig(rotation_noise_deg=2.0, translation_noise_pct=1.0)
        )
        assert cfg.pose_opt.pose_lr == 1e-4
        assert cfg.pose_opt.rotation_reg_weight == 0.01

    def test_customized_knobs_win(self):
        from robust_nerf_tpu.core.noise import NoiseConfig
        from robust_nerf_tpu.training.train_pose_opt import _maybe_auto_severe

        cfg = self._cfg(pose_lr=2e-4)
        _maybe_auto_severe(cfg, NoiseConfig(rotation_noise_deg=5.0))
        assert cfg.pose_opt.pose_lr == 2e-4
        assert cfg.pose_opt.rotation_reg_weight == 0.01   # untouched

    def test_opt_out_flag(self):
        from robust_nerf_tpu.core.noise import NoiseConfig
        from robust_nerf_tpu.training.train_pose_opt import _maybe_auto_severe

        cfg = self._cfg(auto_preset=False)
        _maybe_auto_severe(cfg, NoiseConfig(rotation_noise_deg=5.0))
        assert cfg.pose_opt.pose_lr == 1e-4

    def test_clean_init_untouched(self):
        from robust_nerf_tpu.training.train_pose_opt import _maybe_auto_severe

        cfg = self._cfg(init_mode="clean")
        _maybe_auto_severe(cfg, None)
        assert cfg.pose_opt.pose_lr == 1e-4

    def test_absolute_translation_threshold(self):
        from robust_nerf_tpu.core.noise import NoiseConfig
        from robust_nerf_tpu.training.train_pose_opt import _maybe_auto_severe

        cfg = self._cfg()
        _maybe_auto_severe(cfg, NoiseConfig(translation_noise=0.2))
        assert cfg.pose_opt.rotation_reg_weight == 0.0   # upgraded

    def test_explicit_flag_at_standard_value_keeps_standard(self):
        """--pose_lr 1e-4 (the standard value, passed explicitly) must keep
        the standard recipe — value comparison can't see this, the
        explicitness set can (ADVICE r4)."""
        from robust_nerf_tpu.core.noise import NoiseConfig
        from robust_nerf_tpu.training.train_pose_opt import _maybe_auto_severe

        cfg = self._cfg()   # values identical to STANDARD_PRESET
        _maybe_auto_severe(
            cfg, NoiseConfig(rotation_noise_deg=5.0),
            explicit_flags=frozenset({"pose_lr"}),
        )
        assert cfg.pose_opt.pose_lr == 1e-4          # NOT upgraded
        assert cfg.pose_opt.rotation_reg_weight == 0.01

    def test_empty_explicit_set_still_upgrades(self):
        from robust_nerf_tpu.core.noise import NoiseConfig
        from robust_nerf_tpu.training.train_pose_opt import _maybe_auto_severe

        cfg = self._cfg()
        _maybe_auto_severe(
            cfg, NoiseConfig(rotation_noise_deg=5.0),
            explicit_flags=frozenset(),
        )
        assert cfg.pose_opt.rotation_reg_weight == 0.0   # upgraded

    def test_resolve_records_explicit_set(self):
        import argparse

        from robust_nerf_tpu.training.train_pose_opt import (
            resolve_pose_opt_defaults,
        )

        args = argparse.Namespace(
            severe_recovery=False, pose_lr=1e-4, pose_opt_delay=None,
            rotation_reg_weight=None, translation_reg_weight=None,
            freq_anneal_iters=None,
        )
        resolve_pose_opt_defaults(args)
        assert args.pose_opt_explicit == frozenset({"pose_lr"})
        assert args.pose_opt_delay == 1000   # filled from the preset


class TestScanCap:
    def test_no_cap_on_cpu_or_mlp(self):
        from robust_nerf_tpu.training.steps import pose_opt_scan_cap

        cfg = rn.NeRFConfig()
        cfg.tpu = rn.TPUConfig(steps_per_scan=250)
        # tests force the CPU backend, so even hashgrid is uncapped here
        cfg.model = rn.ModelConfig(architecture="hashgrid")
        assert pose_opt_scan_cap(cfg) == 250
        cfg.model = rn.ModelConfig()
        assert pose_opt_scan_cap(cfg) == 250

    def test_cap_on_tpu_hashgrid(self, monkeypatch):
        import robust_nerf_tpu.training.steps as steps

        monkeypatch.setattr(steps.jax, "default_backend", lambda: "tpu")
        cfg = rn.NeRFConfig()
        cfg.tpu = rn.TPUConfig(steps_per_scan=250)
        # only the XOR scheme triggers the worker fault; "packed" (the
        # default) runs 250-step scans clean on chip (round-5 probe)
        cfg.model = rn.ModelConfig(architecture="hashgrid", hash_impl="xor")
        with pytest.warns(UserWarning, match="capping steps_per_scan"):
            assert steps.pose_opt_scan_cap(cfg) == 50
        cfg.model = rn.ModelConfig(architecture="hashgrid")
        assert steps.pose_opt_scan_cap(cfg) == 250
        # MLP stays uncapped even on TPU
        cfg.model = rn.ModelConfig()
        assert steps.pose_opt_scan_cap(cfg) == 250
        # small scans pass through untouched
        cfg.model = rn.ModelConfig(architecture="hashgrid", hash_impl="xor")
        cfg.tpu = rn.TPUConfig(steps_per_scan=25)
        assert steps.pose_opt_scan_cap(cfg) == 25
