"""Test-time pose refinement against a frozen scene (evalx/pose_refine.py).

No reference counterpart (the reference renders GT val poses directly,
noisy_src/train_pose_opt.py:473-545); contracts here: photometric loss
falls, perturbed poses move back toward the truth, clean poses stay put,
and the scene is untouched.
"""

import copy

import jax
import numpy as np
import pytest

from robust_nerf_tpu.core.se3 import pose_errors
from robust_nerf_tpu.data.banks import build_ray_bank
from robust_nerf_tpu.evalx.pose_refine import refine_poses
from robust_nerf_tpu.training.steps import create_train_state, make_train_chunk


@pytest.fixture(scope="module")
def trained_models(tiny_config, tiny_scene):
    cfg = copy.deepcopy(tiny_config)
    bank, _, _ = build_ray_bank(tiny_scene)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    chunk = make_train_chunk(cfg, steps=50)
    for _ in range(8):
        state, _ = chunk(state, bank, jax.random.PRNGKey(1))
    return cfg, state.models


class TestRefinePoses:
    def test_perturbed_poses_recover(self, trained_models, tiny_scene):
        cfg, models = trained_models
        from robust_nerf_tpu.core.noise import add_noise_to_pose

        gt = np.asarray(tiny_scene.poses[:4])
        rng = np.random.default_rng(3)
        noisy = np.stack([
            add_noise_to_pose(gt[i], rotation_noise_deg=1.5,
                              translation_noise=0.05, rng=rng)[0]
            for i in range(gt.shape[0])
        ])
        e0 = jax.device_get(pose_errors(noisy, gt))
        refined, info = refine_poses(
            models, cfg, noisy, np.asarray(tiny_scene.images[:4]),
            tiny_scene.H, tiny_scene.W, tiny_scene.focal,
            iters=300, batch_size=1024, lr=3e-3, steps_per_scan=100,
        )
        e1 = jax.device_get(pose_errors(refined, gt))
        assert info["final_loss"] < info["first_loss"]
        assert (
            float(e1["mean_rotation_error_deg"])
            < 0.7 * float(e0["mean_rotation_error_deg"])
        )
        assert (
            float(e1["mean_translation_error"])
            < 0.7 * float(e0["mean_translation_error"])
        )

    def test_clean_poses_stay_put(self, trained_models, tiny_scene):
        cfg, models = trained_models
        gt = np.asarray(tiny_scene.poses[:2])
        refined, _ = refine_poses(
            models, cfg, gt, np.asarray(tiny_scene.images[:2]),
            tiny_scene.H, tiny_scene.W, tiny_scene.focal,
            iters=100, batch_size=512, lr=1e-3, steps_per_scan=50,
        )
        e = jax.device_get(pose_errors(refined, gt))
        # converged-scene wander at this scale stays tiny
        assert float(e["mean_rotation_error_deg"]) < 0.5

    def test_scene_params_untouched(self, trained_models, tiny_scene):
        cfg, models = trained_models
        before = jax.tree_util.tree_map(np.asarray, models)
        refine_poses(
            models, cfg, np.asarray(tiny_scene.poses[:2]),
            np.asarray(tiny_scene.images[:2]),
            tiny_scene.H, tiny_scene.W, tiny_scene.focal,
            iters=50, batch_size=512, steps_per_scan=50,
        )
        after = jax.tree_util.tree_map(np.asarray, models)
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after)):
            np.testing.assert_array_equal(a, b)
