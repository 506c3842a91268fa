"""Data layer tests — synthetic scene, Blender loader (with a generated
on-disk fixture), ray/pixel banks, in-jit batch sampling."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_nerf_tpu.core.noise import NoiseConfig
from robust_nerf_tpu.data.banks import (
    build_pixel_bank,
    build_ray_bank,
    sample_pixel_batch,
    sample_ray_batch,
)
from robust_nerf_tpu.data.blender import load_blender_data
from robust_nerf_tpu.data.synthetic import make_synthetic_scene, pose_spherical


class TestSyntheticScene:
    def test_shapes(self, tiny_scene):
        assert tiny_scene.images.shape == (8, 24, 24, 3)
        assert tiny_scene.poses.shape == (8, 4, 4)
        assert tiny_scene.H == tiny_scene.W == 24

    def test_white_background_corners(self, tiny_scene):
        corners = tiny_scene.images[:, 0, 0, :]
        assert np.all(corners > 0.95)

    def test_object_visible(self, tiny_scene):
        assert tiny_scene.images.min() < 0.6

    def test_images_in_range(self, tiny_scene):
        assert tiny_scene.images.min() >= 0.0
        assert tiny_scene.images.max() <= 1.0

    def test_poses_look_at_origin(self, tiny_scene):
        for pose in tiny_scene.poses:
            cam_pos = pose[:3, 3]
            view_dir = -pose[:3, 2]   # camera looks down -Z
            to_origin = -cam_pos / np.linalg.norm(cam_pos)
            assert np.dot(view_dir, to_origin) > 0.99

    def test_pose_spherical_orthonormal(self):
        p = pose_spherical(30.0, -25.0, 4.0)
        R = p[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(p[:3, 3]), 4.0, atol=1e-5)

    def test_splits_differ(self):
        a = make_synthetic_scene(num_images=2, resolution=16, split="train", num_samples=64)
        b = make_synthetic_scene(num_images=2, resolution=16, split="val", num_samples=64)
        assert not np.allclose(a.poses, b.poses)

    def test_deterministic(self):
        a = make_synthetic_scene(num_images=2, resolution=16, num_samples=64)
        b = make_synthetic_scene(num_images=2, resolution=16, num_samples=64)
        np.testing.assert_array_equal(a.images, b.images)

    def test_row_chunked_gt_render_matches_single_block(self, monkeypatch):
        # large-resolution GT frames render in row blocks to bound HBM;
        # force chunking at tiny size and require bit-equality with the
        # unchunked path (incl. an uneven remainder block: 24 = 10+10+4)
        import robust_nerf_tpu.data.synthetic as syn

        whole = make_synthetic_scene(num_images=1, resolution=24,
                                     num_samples=64, textured=True)
        monkeypatch.setattr(syn, "_GT_MAX_PIXELS_PER_BLOCK", 10 * 24)
        chunked = make_synthetic_scene(num_images=1, resolution=24,
                                       num_samples=64, textured=True)
        np.testing.assert_array_equal(whole.images, chunked.images)


class TestSceneFamily:
    """The 8-member procedural family (SYNTHETIC_SCENES) standing in for
    the Blender 8-scene sweep (SURVEY.md §7 item 14)."""

    def test_classic_aliases_unchanged(self):
        from robust_nerf_tpu.data.synthetic import scene_params

        for name in ("lego", "synthetic", "blobs"):
            c, r, d, col, tf, tp = scene_params(name)
            np.testing.assert_array_equal(tf, [9.0, 11.0, 10.0])
            assert c.shape == (5, 3)
        # the classic scene renders bit-identically to the default
        a = make_synthetic_scene(num_images=1, resolution=16, num_samples=64)
        b = make_synthetic_scene(
            num_images=1, resolution=16, num_samples=64, scene_name="lego"
        )
        np.testing.assert_array_equal(a.images, b.images)

    def test_family_members_distinct_and_valid(self):
        from robust_nerf_tpu.data.synthetic import SYNTHETIC_SCENES, scene_params

        assert len(SYNTHETIC_SCENES) == 8
        imgs = {}
        for name in SYNTHETIC_SCENES[:4]:
            s = make_synthetic_scene(
                num_images=1, resolution=16, num_samples=64, scene_name=name
            )
            assert np.all(np.isfinite(s.images))
            assert s.images.min() >= 0.0 and s.images.max() <= 1.0
            # object visible: not an all-white frame
            assert s.images.min() < 0.9
            imgs[name] = s.images
        names = list(imgs)
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                assert not np.allclose(imgs[names[i]], imgs[names[j]]), (
                    f"{names[i]} and {names[j]} render identically"
                )

    def test_generated_params_well_conditioned(self):
        from robust_nerf_tpu.data.synthetic import SYNTHETIC_SCENES, scene_params

        for name in SYNTHETIC_SCENES:
            c, r, d, col, tf, tp = scene_params(name)
            k = c.shape[0]
            assert 4 <= k <= 8 or name == "blobs"
            assert np.all(np.linalg.norm(c, axis=-1) <= 0.81)
            assert np.all((r > 0.1) & (r < 0.5))
            assert np.all(col >= 0.0) and np.all(col <= 1.0)
            # deterministic across calls
            c2 = scene_params(name)[0]
            np.testing.assert_array_equal(c, c2)

    def test_load_scene_respects_scene_name(self):
        from robust_nerf_tpu.config import DataConfig
        from robust_nerf_tpu.data.synthetic import load_scene

        cfg = DataConfig(
            scene_name="crown", source="synthetic",
            synthetic_num_train=1, synthetic_resolution=16,
        )
        a = load_scene(cfg, "train")
        b = make_synthetic_scene(
            num_images=1, resolution=16, scene_name="crown"
        )
        np.testing.assert_array_equal(a.images, b.images)


class TestBlenderLoader:
    @pytest.fixture
    def fake_blender_dir(self, tmp_path):
        """Write a minimal valid Blender-layout scene to disk."""
        from PIL import Image

        scene_dir = tmp_path / "nerf_synthetic" / "testscene"
        (scene_dir / "train").mkdir(parents=True)
        rng = np.random.default_rng(0)
        frames = []
        for i in range(3):
            rgba = (rng.uniform(0, 255, (32, 32, 4))).astype(np.uint8)
            rgba[..., 3] = np.where(rng.uniform(size=(32, 32)) > 0.5, 255, 0)
            Image.fromarray(rgba, "RGBA").save(scene_dir / "train" / f"r_{i}.png")
            pose = np.eye(4)
            pose[:3, 3] = [0, 0, 4 + i]
            frames.append(
                {"file_path": f"./train/r_{i}", "transform_matrix": pose.tolist()}
            )
        with open(scene_dir / "transforms_train.json", "w") as f:
            json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)
        return tmp_path

    def test_load(self, fake_blender_dir):
        data = load_blender_data(fake_blender_dir, "testscene", "train", img_scale=1.0)
        assert data.images.shape == (3, 32, 32, 3)
        assert data.poses.shape == (3, 4, 4)
        assert 0.0 <= data.images.min() and data.images.max() <= 1.0
        # focal = 0.5*32/tan(0.6911/2)
        expected = 0.5 * 32 / np.tan(0.5 * 0.6911)
        np.testing.assert_allclose(data.focal, expected, rtol=1e-5)

    def test_img_scale(self, fake_blender_dir):
        data = load_blender_data(fake_blender_dir, "testscene", "train", img_scale=0.5)
        assert data.images.shape == (3, 16, 16, 3)

    def test_rgba_white_composite(self, fake_blender_dir):
        """Alpha=0 pixels must composite to white (data.py:116-122)."""
        data = load_blender_data(fake_blender_dir, "testscene", "train", img_scale=1.0)
        from PIL import Image

        raw = np.asarray(
            Image.open(
                fake_blender_dir / "nerf_synthetic" / "testscene" / "train" / "r_0.png"
            )
        )
        transparent = raw[..., 3] == 0
        assert np.all(data.images[0][transparent] > 0.99)

    def test_missing_scene_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_blender_data(tmp_path, "nope", "train")


class TestRayBank:
    def test_build(self, tiny_scene):
        bank, poses, infos = build_ray_bank(tiny_scene)
        M = 8 * 24 * 24
        assert bank.rays_o.shape == (M, 3)
        assert bank.rays_d.shape == (M, 3)
        assert bank.rgb.shape == (M, 3)
        assert infos == []
        np.testing.assert_allclose(poses, tiny_scene.poses)

    def test_noise_applied(self, tiny_scene):
        nc = NoiseConfig(rotation_noise_deg=5.0, seed=1)
        bank_n, poses_n, infos = build_ray_bank(tiny_scene, nc)
        assert len(infos) == 8
        assert not np.allclose(poses_n, tiny_scene.poses)
        bank_c, _, _ = build_ray_bank(tiny_scene)
        assert not np.allclose(np.asarray(bank_n.rays_d), np.asarray(bank_c.rays_d))

    def test_directions_normalized(self, tiny_scene):
        bank, _, _ = build_ray_bank(tiny_scene)
        norms = np.linalg.norm(np.asarray(bank.rays_d), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_sample_batch(self, tiny_scene):
        bank, _, _ = build_ray_bank(tiny_scene)
        batch = sample_ray_batch(bank, jax.random.PRNGKey(0), 128)
        assert batch["rays_o"].shape == (128, 3)
        assert batch["target_rgb"].shape == (128, 3)
        # deterministic per key
        batch2 = sample_ray_batch(bank, jax.random.PRNGKey(0), 128)
        np.testing.assert_array_equal(
            np.asarray(batch["rays_o"]), np.asarray(batch2["rays_o"])
        )
        batch3 = sample_ray_batch(bank, jax.random.PRNGKey(1), 128)
        assert not np.allclose(
            np.asarray(batch["rays_o"]), np.asarray(batch3["rays_o"])
        )

    def test_sampling_inside_jit(self, tiny_scene):
        bank, _, _ = build_ray_bank(tiny_scene)
        f = jax.jit(lambda k: sample_ray_batch(bank, k, 64)["target_rgb"].mean())
        assert np.isfinite(float(f(jax.random.PRNGKey(0))))


class TestPixelBank:
    def test_build(self, tiny_scene):
        bank = build_pixel_bank(tiny_scene)
        M = 8 * 24 * 24
        assert bank.image_indices.shape == (M,)
        assert bank.rgb.shape == (M, 3)
        assert bank.directions.shape == (24, 24, 3)
        # coords consistent: target == images[img, v, u]
        idx = np.array([0, 100, M // 2, M - 1])
        imgs = np.asarray(bank.image_indices)[idx]
        us = np.asarray(bank.us)[idx]
        vs = np.asarray(bank.vs)[idx]
        np.testing.assert_allclose(
            np.asarray(bank.rgb)[idx], tiny_scene.images[imgs, vs, us], atol=1e-6
        )

    def test_sample_pixel_batch(self, tiny_scene):
        bank = build_pixel_bank(tiny_scene)
        b = sample_pixel_batch(bank, jax.random.PRNGKey(0), 64)
        assert b["image_indices"].shape == (64,)
        assert int(b["image_indices"].max()) < 8
        assert int(b["us"].max()) < 24
        assert int(b["vs"].max()) < 24
