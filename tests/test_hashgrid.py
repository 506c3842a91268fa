"""Multiresolution hash-grid model family (models/hashgrid.py).

No reference counterpart (the reference has only the frequency MLP,
noisy_src/model.py) — these tests cover the family's own contracts:
encoding math (dense + hashed levels, trilinear interpolation at grid
vertices), gradient flow into the tables, architecture dispatch through
render_rays/steps, convergence on the analytic scene, checkpoint
round-trip, and composition with pose-opt / microbatching / the
8-device data-parallel mesh.
"""

import copy
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_nerf_tpu.config import (
    ModelConfig,
    PoseOptConfig,
    RenderConfig,
)
from robust_nerf_tpu.data.banks import build_pixel_bank, build_ray_bank
from robust_nerf_tpu.models.hashgrid import (
    GEO_FEAT_DIM,
    hashgrid_apply,
    hashgrid_encode,
    init_hashgrid_params,
    level_resolutions,
    level_table_size,
)
from robust_nerf_tpu.models.nerf import count_params, create_nerf, model_apply_fn, nerf_apply
from robust_nerf_tpu.ops.rendering import render_rays
from robust_nerf_tpu.training.steps import (
    create_pose_opt_state,
    create_train_state,
    make_pose_opt_chunk,
    make_train_chunk,
)

HCFG = ModelConfig(
    architecture="hashgrid", hash_levels=6, hash_log2_size=12, hash_max_res=128
)


def _hash_config(tiny_config, **model_overrides):
    cfg = copy.deepcopy(tiny_config)
    cfg.model = dataclasses.replace(HCFG, **model_overrides)
    return cfg


class TestEncoding:
    def test_level_resolutions_geometric(self):
        res = level_resolutions(HCFG)
        assert res[0] == HCFG.hash_base_res
        assert res[-1] in (HCFG.hash_max_res, HCFG.hash_max_res - 1)
        assert all(a < b for a, b in zip(res, res[1:]))

    def test_dense_vs_hashed_table_sizes(self):
        # coarse levels fit dense; fine levels cap at 2^log2_size
        assert level_table_size(15, 12) == 16**3
        assert level_table_size(100, 12) == 4096
        cfg = dataclasses.replace(HCFG, hash_log2_size=13)  # 8192 >= 17^3
        params = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
        sizes = [params[f"table_{l}"].shape[0] for l in range(cfg.hash_levels)]
        assert sizes[0] == (level_resolutions(cfg)[0] + 1) ** 3  # dense
        assert sizes[-1] == 8192  # hashed cap

    def test_vertex_interpolation_exact_on_dense_level(self):
        """At an exact grid vertex of a dense level, the interpolated
        feature IS that vertex's table row (trilinear weights collapse)."""
        cfg = dataclasses.replace(HCFG, hash_levels=1, hash_base_res=4,
                                  hash_max_res=4, hash_log2_size=12)
        params = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
        res = 4
        # vertex (1, 2, 3) of the [0,1]^3 grid -> world coords
        v = np.array([1, 2, 3])
        x01 = v / res
        world = (x01 * 2.0 - 1.0) * cfg.scene_bound
        feats = hashgrid_encode(params, jnp.asarray(world[None], jnp.float32), cfg)
        idx = v[0] + (res + 1) * (v[1] + (res + 1) * v[2])
        np.testing.assert_allclose(
            np.asarray(feats[0]), np.asarray(params["table_0"][idx]),
            rtol=0, atol=1e-6,
        )

    def test_encoding_continuous_midpoint(self):
        """Midpoint of two vertices = mean of their features (linear interp
        along one axis)."""
        cfg = dataclasses.replace(HCFG, hash_levels=1, hash_base_res=4,
                                  hash_max_res=4, hash_log2_size=12)
        params = init_hashgrid_params(jax.random.PRNGKey(1), cfg)
        res = 4

        def world(v):
            return (np.asarray(v) / res * 2.0 - 1.0) * cfg.scene_bound

        pts = jnp.asarray(
            np.stack([world([1, 2, 3]), world([2, 2, 3]), world([1.5, 2, 3])]),
            jnp.float32,
        )
        f = np.asarray(hashgrid_encode(params, pts, cfg))
        np.testing.assert_allclose(f[2], 0.5 * (f[0] + f[1]), atol=1e-6)

    def test_out_of_bound_points_clamp(self):
        params = init_hashgrid_params(jax.random.PRNGKey(0), HCFG)
        far = jnp.full((5, 3), 100.0)
        edge = jnp.full((5, 3), HCFG.scene_bound)
        np.testing.assert_allclose(
            np.asarray(hashgrid_encode(params, far, HCFG)),
            np.asarray(hashgrid_encode(params, edge, HCFG)),
            atol=1e-6,
        )

    def test_anneal_alpha_zero_gates_all_levels(self):
        params = init_hashgrid_params(jax.random.PRNGKey(0), HCFG)
        pts = jax.random.uniform(jax.random.PRNGKey(2), (9, 3), minval=-1, maxval=1)
        f0 = np.asarray(hashgrid_encode(params, pts, HCFG, anneal_alpha=0.0))
        assert np.abs(f0).max() == 0.0
        f_full = np.asarray(
            hashgrid_encode(params, pts, HCFG, anneal_alpha=HCFG.pos_freqs)
        )
        f_none = np.asarray(hashgrid_encode(params, pts, HCFG))
        np.testing.assert_allclose(f_full, f_none, atol=1e-6)


class TestApply:
    def test_shapes_and_ranges(self):
        params = init_hashgrid_params(jax.random.PRNGKey(0), HCFG)
        pts = jax.random.uniform(jax.random.PRNGKey(1), (7, 5, 3), minval=-2, maxval=2)
        dirs = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        rgb, sigma = hashgrid_apply(params, pts, dirs, HCFG)
        assert rgb.shape == (7, 5, 3) and sigma.shape == (7, 5, 1)
        r, s = np.asarray(rgb), np.asarray(sigma)
        assert np.isfinite(r).all() and (r >= 0).all() and (r <= 1).all()
        assert np.isfinite(s).all() and (s >= 0).all()

    def test_no_view_dirs(self):
        cfg = dataclasses.replace(HCFG, use_view_dirs=False)
        params = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
        pts = jnp.zeros((4, 3))
        rgb, sigma = hashgrid_apply(params, pts, None, cfg)
        assert rgb.shape == (4, 3) and sigma.shape == (4, 1)

    def test_grads_reach_tables_and_mlp(self):
        params = init_hashgrid_params(jax.random.PRNGKey(0), HCFG)
        pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (64, 1))

        def loss(p):
            rgb, sigma = hashgrid_apply(p, pts, dirs, HCFG)
            return jnp.mean(rgb) + jnp.mean(sigma)

        g = jax.grad(loss)(params)
        for k in ("table_0", f"table_{HCFG.hash_levels - 1}", "sigma_0_w",
                  "sigma_head_w", "color_0_w", "rgb_w"):
            assert float(jnp.abs(g[k]).sum()) > 0.0, k

    def test_bfloat16_compute(self):
        params = init_hashgrid_params(jax.random.PRNGKey(0), HCFG)
        pts = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-1, maxval=1)
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (16, 1))
        rgb, sigma = hashgrid_apply(params, pts, dirs, HCFG, compute_dtype=jnp.bfloat16)
        assert rgb.dtype == jnp.float32 and sigma.dtype == jnp.float32
        assert np.isfinite(np.asarray(rgb)).all()

    def test_sigma_head_output_dim(self):
        params = init_hashgrid_params(jax.random.PRNGKey(0), HCFG)
        assert params["sigma_head_w"].shape[1] == 1 + GEO_FEAT_DIM


class TestDispatch:
    def test_model_apply_fn_routes_by_architecture(self):
        assert model_apply_fn(ModelConfig()) is nerf_apply
        assert model_apply_fn(HCFG) is hashgrid_apply
        assert model_apply_fn(None) is nerf_apply

    def test_create_nerf_builds_hash_family(self):
        models = create_nerf(jax.random.PRNGKey(0), HCFG)
        assert "table_0" in models["coarse"] and "table_0" in models["fine"]
        assert count_params(models["coarse"]) > 0

    def test_render_rays_dispatches_without_apply_fn(self):
        models = create_nerf(jax.random.PRNGKey(0), HCFG)
        rcfg = RenderConfig(num_samples=8, num_samples_fine=8)
        ro = jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (4, 1))
        rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1))
        out = render_rays(models, ro, rd, jax.random.PRNGKey(1), rcfg, HCFG)
        assert np.isfinite(np.asarray(out["rgb_fine"])).all()

    def test_tensor_parallel_rejected(self, tiny_config):
        from robust_nerf_tpu.parallel.tp import create_mesh_2d, maybe_shard_state

        cfg = _hash_config(tiny_config)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        mesh = create_mesh_2d(4, 2)
        with pytest.raises(ValueError, match="frequency-MLP"):
            maybe_shard_state(state, mesh, cfg)


class TestTraining:
    def test_train_chunk_runs_and_descends(self, tiny_config, tiny_scene):
        cfg = _hash_config(tiny_config)
        cfg.train = dataclasses.replace(cfg.train, lr=1e-2)
        bank, _, _ = build_ray_bank(tiny_scene)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        chunk = make_train_chunk(cfg, steps=20)
        key = jax.random.PRNGKey(1)
        state, m0 = chunk(state, bank, key)
        for _ in range(4):
            key, k = jax.random.split(key)
            state, m = chunk(state, bank, k)
        first = float(np.asarray(m0["loss"])[0])
        last = float(np.asarray(m["loss"])[-1])
        assert np.isfinite(last) and last < first * 0.5

    def test_converges_past_25db_fast(self, tiny_config, tiny_scene):
        """600 iters of lr-1e-2 hashgrid training clear 25 dB on the tiny
        scene — the family's whole point (the MLP needs ~3x the iters)."""
        cfg = _hash_config(tiny_config)
        cfg.train = dataclasses.replace(cfg.train, lr=1e-2)
        bank, _, _ = build_ray_bank(tiny_scene)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        chunk = make_train_chunk(cfg, steps=100)
        key = jax.random.PRNGKey(1)
        for _ in range(6):
            key, k = jax.random.split(key)
            state, m = chunk(state, bank, k)
        psnr = float(np.asarray(m.get("psnr_fine", m["psnr_coarse"]))[-1])
        assert psnr > 25.0, f"hashgrid train PSNR {psnr:.2f} <= 25 dB @600 iters"

    def test_microbatch_composes(self, tiny_config, tiny_scene):
        cfg = _hash_config(tiny_config)
        cfg.tpu = dataclasses.replace(cfg.tpu, microbatch=64)
        bank, _, _ = build_ray_bank(tiny_scene)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        chunk = make_train_chunk(cfg, steps=5)
        state, m = chunk(state, bank, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(m["loss"])).all()

    def test_pose_opt_composes(self, tiny_config, tiny_scene):
        cfg = _hash_config(tiny_config)
        cfg.pose_opt = PoseOptConfig(pose_opt_delay=0)
        bank = build_pixel_bank(tiny_scene)
        state = create_pose_opt_state(
            jax.random.PRNGKey(0), cfg, jnp.asarray(tiny_scene.poses)
        )
        chunk = make_pose_opt_chunk(cfg, steps=5)
        state, m = chunk(state, bank, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(m["loss"])).all()
        # photometric grads must reach the pose deltas through ray regen
        assert float(jnp.abs(state.pose_params["rotation_deltas"]).sum()) > 0

    def test_data_parallel_mesh_composes(self, tiny_config, tiny_scene):
        from robust_nerf_tpu.parallel.mesh import create_mesh, replicate

        cfg = _hash_config(tiny_config)
        mesh = create_mesh(8)
        bank, _, _ = build_ray_bank(tiny_scene)
        state = replicate(create_train_state(jax.random.PRNGKey(0), cfg), mesh)
        chunk = make_train_chunk(cfg, steps=3, mesh=mesh)
        state, m = chunk(state, bank, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(m["loss"])).all()


class TestCheckpoint:
    def test_roundtrip_rebuilds_from_config(self, tiny_config, tmp_path):
        from robust_nerf_tpu.config import config_from_dict, config_to_dict
        from robust_nerf_tpu.training.checkpoints import (
            load_checkpoint_raw,
            restore_into,
            save_checkpoint,
        )

        cfg = _hash_config(tiny_config)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        path = save_checkpoint(
            tmp_path, 7, state, config_to_dict(cfg), backend="npz"
        )
        leaves, meta, extra = load_checkpoint_raw(path)
        cfg2 = config_from_dict(meta["config"])
        assert cfg2.model.architecture == "hashgrid"
        assert cfg2.model.hash_levels == cfg.model.hash_levels
        template = create_train_state(jax.random.PRNGKey(1), cfg2)
        restored = restore_into(template, leaves)
        np.testing.assert_array_equal(
            np.asarray(restored.models["coarse"]["table_0"]),
            np.asarray(state.models["coarse"]["table_0"]),
        )
        # dict round-trip preserves every hash field
        assert config_to_dict(cfg2)["model"] == config_to_dict(cfg)["model"]
