"""Multi-device sharding tests on an 8-virtual-CPU-device mesh.

The fake-pod substitute for TPU hardware (SURVEY.md §4): verifies that the
data-parallel train step compiles and runs over a real jax.sharding.Mesh,
that sharded and single-device training produce identical numerics, and
that per-image pose gradients reduce correctly across shards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from robust_nerf_tpu.config import PoseOptConfig
from robust_nerf_tpu.core.noise import NoiseConfig, add_noise_to_poses
from robust_nerf_tpu.data.banks import build_pixel_bank, build_ray_bank
from robust_nerf_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
)
from robust_nerf_tpu.training.steps import (
    create_pose_opt_state,
    create_train_state,
    make_pose_opt_chunk,
    make_train_chunk,
)


def test_virtual_devices_present():
    assert jax.device_count() >= 8


class TestMesh:
    def test_create_mesh_all(self):
        mesh = create_mesh()
        assert int(np.prod(mesh.devices.shape)) == jax.device_count()
        assert mesh.axis_names == ("data",)

    def test_create_mesh_subset(self):
        mesh = create_mesh(num_devices=4)
        assert int(np.prod(mesh.devices.shape)) == 4

    def test_shard_batch_places_data(self):
        mesh = create_mesh(num_devices=8)
        x = {"a": jnp.arange(64, dtype=jnp.float32).reshape(64, 1)}
        sharded = shard_batch(x, mesh)
        assert sharded["a"].sharding == batch_sharding(mesh)


class TestShardedTraining:
    def test_sharded_matches_single_device(self, tiny_scene, tiny_config):
        """Bitwise-level equivalence between 1-device and 8-device DP:
        replicated params + sharded batch must give the same training
        trajectory (psum'd grads == full-batch grads)."""
        cfg = tiny_config
        bank, _, _ = build_ray_bank(tiny_scene)

        state1 = create_train_state(jax.random.PRNGKey(0), cfg)
        chunk1 = make_train_chunk(cfg, mesh=None, steps=10)
        state1, m1 = chunk1(state1, bank, jax.random.PRNGKey(1))

        mesh = create_mesh(num_devices=8)
        state8 = create_train_state(jax.random.PRNGKey(0), cfg)
        state8 = replicate(state8, mesh)
        bank8 = replicate(bank, mesh)
        chunk8 = make_train_chunk(cfg, mesh=mesh, steps=10)
        state8, m8 = chunk8(state8, bank8, jax.random.PRNGKey(1))

        np.testing.assert_allclose(
            np.asarray(m1["loss"]), np.asarray(m8["loss"]), rtol=1e-4, atol=1e-6
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(state1.models),
            jax.tree_util.tree_leaves(state8.models),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            )

    def test_pose_opt_sharded_matches_single(self, tiny_scene, tiny_config):
        """Per-image pose grads must psum identically: each shard sees only
        a subset of pixels from each image."""
        cfg = tiny_config
        cfg.pose_opt = PoseOptConfig(pose_opt_delay=0, pose_lr=1e-3)
        bank = build_pixel_bank(tiny_scene)
        noisy, _ = add_noise_to_poses(
            tiny_scene.poses, NoiseConfig(rotation_noise_deg=2.0, seed=0)
        )

        s1 = create_pose_opt_state(jax.random.PRNGKey(0), cfg, jnp.asarray(noisy))
        c1 = make_pose_opt_chunk(cfg, mesh=None, steps=5)
        s1, _ = c1(s1, bank, jax.random.PRNGKey(1))

        mesh = create_mesh(num_devices=8)
        s8 = create_pose_opt_state(jax.random.PRNGKey(0), cfg, jnp.asarray(noisy))
        s8 = replicate(s8, mesh)
        bank8 = replicate(bank, mesh)
        c8 = make_pose_opt_chunk(cfg, mesh=mesh, steps=5)
        s8, _ = c8(s8, bank8, jax.random.PRNGKey(1))

        np.testing.assert_allclose(
            np.asarray(s1.pose_params["rotation_deltas"]),
            np.asarray(s8.pose_params["rotation_deltas"]),
            rtol=1e-3, atol=1e-6,
        )

    def test_uneven_mesh_sizes(self, tiny_scene, tiny_config):
        """2- and 4-device meshes also compile and run."""
        cfg = tiny_config
        bank, _, _ = build_ray_bank(tiny_scene)
        for n in (2, 4):
            mesh = create_mesh(num_devices=n)
            state = replicate(create_train_state(jax.random.PRNGKey(0), cfg), mesh)
            chunk = make_train_chunk(cfg, mesh=mesh, steps=3)
            state, m = chunk(state, replicate(bank, mesh), jax.random.PRNGKey(1))
            assert np.all(np.isfinite(np.asarray(m["loss"])))


class TestShardedBank:
    """TPUConfig.shard_bank: the bank is SPLIT across devices (1/D HBM per
    chip) and each device samples only its local shard (data/banks.py)."""

    @staticmethod
    def _shard_cfg(cfg):
        import dataclasses

        return dataclasses.replace(
            cfg, tpu=dataclasses.replace(cfg.tpu, shard_bank=True)
        )

    def test_shard_bank_placement(self, tiny_scene):
        from robust_nerf_tpu.data.banks import build_pixel_bank, shard_bank

        mesh = create_mesh(num_devices=8)
        bank = build_pixel_bank(tiny_scene)
        sbank = shard_bank(bank, mesh)
        # flat leaves split on the data axis, padded to a multiple of 8
        assert sbank.rgb.sharding == NamedSharding(mesh, P("data"))
        assert sbank.rgb.shape[0] % 8 == 0
        assert sbank.rgb.shape[0] >= bank.rgb.shape[0]
        # the direction grid stays replicated
        assert sbank.directions.sharding.is_fully_replicated

    def test_sharded_sampler_locality(self, tiny_scene):
        """Each device's slice of the sampled batch must come from its own
        bank shard — the gather never crosses devices."""
        from robust_nerf_tpu.data.banks import (
            build_ray_bank,
            make_sharded_ray_sampler,
            shard_bank,
        )

        mesh = create_mesh(num_devices=8)
        bank, _, _ = build_ray_bank(tiny_scene)
        m = bank.rgb.shape[0]
        # encode the global row index in the rgb field
        tagged = bank._replace(
            rgb=jnp.arange(m, dtype=jnp.float32)[:, None] * jnp.ones((1, 3))
        )
        sbank = shard_bank(tagged, mesh)
        m_pad = sbank.rgb.shape[0]
        per_shard = m_pad // 8
        batch = make_sharded_ray_sampler(mesh, 64)(sbank, jax.random.PRNGKey(0))
        got = np.asarray(batch["target_rgb"])[:, 0].astype(np.int64)
        for d in range(8):
            rows = got[d * 8:(d + 1) * 8]
            lo, hi = d * per_shard, (d + 1) * per_shard
            # padded wraparound rows alias low global indices — map back
            rows = np.where(rows >= m, rows - m, rows)
            in_shard = ((rows >= lo) & (rows < hi)) | (rows < (hi - m))
            assert in_shard.all(), (d, rows)

    def test_sampler_requires_divisible_batch(self, tiny_scene):
        from robust_nerf_tpu.data.banks import make_sharded_ray_sampler

        mesh = create_mesh(num_devices=8)
        with pytest.raises(ValueError):
            make_sharded_ray_sampler(mesh, 100)

    def test_sharded_bank_training_converges(self, tiny_scene, tiny_config):
        from robust_nerf_tpu.data.banks import shard_bank

        cfg = self._shard_cfg(tiny_config)
        mesh = create_mesh(num_devices=8)
        bank, _, _ = build_ray_bank(tiny_scene)
        state = replicate(create_train_state(jax.random.PRNGKey(0), cfg), mesh)
        chunk = make_train_chunk(cfg, mesh=mesh, steps=30)
        state, metrics = chunk(
            state, shard_bank(bank, mesh), jax.random.PRNGKey(1)
        )
        losses = np.asarray(metrics["loss"])
        assert np.all(np.isfinite(losses))
        assert losses[-5:].mean() < losses[:5].mean()

    def test_sharded_bank_pose_opt_updates_all_images(self, tiny_scene,
                                                      tiny_config):
        """With the bank split by contiguous pixel blocks, each image's pose
        gradient originates on a single device; after enough steps EVERY
        image's deltas must have moved (psum + replicated update works)."""
        import dataclasses

        from robust_nerf_tpu.data.banks import build_pixel_bank, shard_bank

        cfg = self._shard_cfg(tiny_config)
        cfg = dataclasses.replace(
            cfg, pose_opt=PoseOptConfig(pose_opt_delay=0, pose_lr=1e-3)
        )
        mesh = create_mesh(num_devices=8)
        noisy, _ = add_noise_to_poses(
            tiny_scene.poses, NoiseConfig(rotation_noise_deg=2.0, seed=0)
        )
        bank = shard_bank(build_pixel_bank(tiny_scene), mesh)
        state = replicate(
            create_pose_opt_state(jax.random.PRNGKey(0), cfg, jnp.asarray(noisy)),
            mesh,
        )
        chunk = make_pose_opt_chunk(cfg, mesh=mesh, steps=20)
        state, metrics = chunk(state, bank, jax.random.PRNGKey(1))
        assert np.all(np.isfinite(np.asarray(metrics["loss"])))
        per_image = np.linalg.norm(
            np.asarray(state.pose_params["rotation_deltas"]), axis=-1
        )
        assert (per_image > 0).all(), per_image


class TestExplicitCollectives:
    def test_psum_grad_equivalence(self):
        """shard_map psum of per-shard grads == full-batch grad — the
        contract the DP layer relies on."""
        from jax.experimental.shard_map import shard_map

        mesh = create_mesh(num_devices=8)
        w = jnp.array([1.5, -0.5, 2.0])
        x = jnp.arange(64, dtype=jnp.float32).reshape(64, 1) / 64.0
        y = jnp.sin(jnp.arange(64, dtype=jnp.float32))

        def loss(w, x, y):
            pred = (x * w[0] + w[1]) * w[2]
            return jnp.mean((pred[:, 0] - y) ** 2)

        g_full = jax.grad(loss)(w, x, y)

        def shard_loss(w, x, y):
            l = loss(w, x, y)
            return jax.lax.pmean(l, "data")

        g_shard = shard_map(
            jax.grad(shard_loss),
            mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=P(),
        )(w, x, y)
        np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_shard), rtol=1e-5)


class TestSyncString:
    """sync_string truncation must happen on a UTF-8 character boundary
    and identically on the single-process early-return path, so the same
    config yields the same output dir at any process count."""

    def test_short_ascii_roundtrip(self):
        from robust_nerf_tpu.parallel.mesh import sync_string

        assert sync_string("lego_noisy_20260818") == "lego_noisy_20260818"

    def test_long_multibyte_truncates_on_char_boundary(self):
        from robust_nerf_tpu.parallel.mesh import sync_string

        s = "é" * 200  # 400 UTF-8 bytes; byte 256 falls mid-character
        out = sync_string(s, max_len=256)
        assert out == "é" * 128
        assert len(out.encode("utf-8")) <= 256


class TestShardedFrameRender:
    """render_image(mesh=...) must equal the single-device frame render:
    rays are embarrassingly parallel, so sharding the pixel axis over the
    mesh cannot change the image."""

    def test_sharded_frame_matches_single(self):
        from robust_nerf_tpu.config import ModelConfig, RenderConfig, TPUConfig
        from robust_nerf_tpu.models.nerf import create_nerf
        from robust_nerf_tpu.ops.rendering import render_image

        mcfg = ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                           num_hidden_layers=2, skips=(1,))
        rcfg = RenderConfig(num_samples=8, num_samples_fine=8)
        models = create_nerf(jax.random.PRNGKey(0), mcfg)
        pose = jnp.eye(4).at[:3, 3].set(jnp.array([0.0, 0.0, 4.0]))
        tpu = TPUConfig(eval_tile=64)
        mesh = create_mesh(num_devices=8)
        single = render_image(models, pose, 20, 20, 25.0, rcfg, mcfg, tpu)
        sharded = render_image(models, pose, 20, 20, 25.0, rcfg, mcfg, tpu,
                               mesh=mesh)
        for k in ("rgb", "depth", "acc"):
            assert sharded[k].shape == single[k].shape
            np.testing.assert_allclose(
                np.asarray(single[k]), np.asarray(sharded[k]), atol=1e-5
            )

    def test_sharded_frame_unaligned_pixels(self):
        """H*W=15*17=255 not divisible by 8 devices: padding must not leak."""
        from robust_nerf_tpu.config import ModelConfig, RenderConfig, TPUConfig
        from robust_nerf_tpu.models.nerf import create_nerf
        from robust_nerf_tpu.ops.rendering import render_image

        mcfg = ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                           num_hidden_layers=2, skips=(1,))
        rcfg = RenderConfig(num_samples=8, num_samples_fine=8)
        models = create_nerf(jax.random.PRNGKey(1), mcfg)
        pose = jnp.eye(4).at[:3, 3].set(jnp.array([0.5, -0.5, 4.0]))
        tpu = TPUConfig(eval_tile=32)
        mesh = create_mesh(num_devices=8)
        single = render_image(models, pose, 15, 17, 25.0, rcfg, mcfg, tpu)
        sharded = render_image(models, pose, 15, 17, 25.0, rcfg, mcfg, tpu,
                               mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(single["rgb"]), np.asarray(sharded["rgb"]), atol=1e-5
        )
