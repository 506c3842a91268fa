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


class TestPackedImpl:
    """The TPU-native "packed" lattice-hash scheme (round 5): linear hash,
    corner-packed dup tables, custom-VJP backward. Contracts: exact parity
    with a naive per-corner implementation, grads matching autodiff,
    dense-level equality with the "xor" scheme, and checkpoint compat."""

    PCFG = dataclasses.replace(HCFG, hash_impl="packed")

    def _naive_encode(self, params, x01, cfg):
        """Per-corner numpy reference of the packed lattice scheme."""
        from robust_nerf_tpu.models.hashgrid import packed_level_specs

        outs = []
        x01 = np.asarray(x01)
        for l, (res, T, ky, kz) in enumerate(packed_level_specs(cfg)):
            t = np.asarray(params[f"table_{l}"])
            xl = x01 * res
            x0 = np.clip(np.floor(xl), 0, res - 1).astype(np.int64)
            fr = xl - x0
            acc = np.zeros((x01.shape[0], t.shape[-1]), np.float32)
            for cz in (0, 1):
                for cy in (0, 1):
                    for cx in (0, 1):
                        idx = ((x0[:, 0] + cx) + ky * (x0[:, 1] + cy)
                               + kz * (x0[:, 2] + cz)) % T
                        w = ((fr[:, 0] if cx else 1 - fr[:, 0])
                             * (fr[:, 1] if cy else 1 - fr[:, 1])
                             * (fr[:, 2] if cz else 1 - fr[:, 2]))
                        acc += w[:, None] * t[idx]
            outs.append(acc)
        return np.concatenate(outs, -1)

    def test_matches_naive_per_corner(self):
        cfg = self.PCFG
        params = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
        pts = jax.random.uniform(
            jax.random.PRNGKey(1), (512, 3), minval=-cfg.scene_bound,
            maxval=cfg.scene_bound,
        )
        out = hashgrid_encode(params, pts, cfg)
        x01 = np.clip((np.asarray(pts) / cfg.scene_bound + 1) * 0.5, 0, 1)
        ref = self._naive_encode(params, x01, cfg)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_custom_vjp_matches_autodiff(self):
        """Backward of the packed path (wide scatter + roll-reduce) must
        equal autodiff of an equivalent forward without the custom VJP."""
        from robust_nerf_tpu.models.hashgrid import (
            _packed_level_fwd,
            packed_level_specs,
        )

        cfg = self.PCFG
        params = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
        specs = packed_level_specs(cfg)
        tables = tuple(params[f"table_{l}"] for l in range(cfg.hash_levels))
        x01 = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))

        def loss_custom(tabs, x):
            from robust_nerf_tpu.models.hashgrid import _packed_encode
            return jnp.sum(jnp.sin(_packed_encode(tabs, x, specs) * 30.0))

        def loss_plain(tabs, x):
            outs = [_packed_level_fwd(t, x, *s)[0] for t, s in zip(tabs, specs)]
            return jnp.sum(jnp.sin(jnp.concatenate(outs, -1) * 30.0))

        gc = jax.grad(loss_custom, argnums=(0, 1))(tables, x01)
        gp = jax.grad(loss_plain, argnums=(0, 1))(tables, x01)
        for a, b in zip(gc[0], gp[0]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
        scale = float(jnp.abs(gp[1]).max()) + 1e-9
        assert float(jnp.abs(gc[1] - gp[1]).max()) / scale < 1e-5

    def test_dense_levels_equal_xor_impl(self):
        """With every level dense ((res+1)^3 <= 2^log2_size) the two schemes
        index identically, so outputs must agree exactly."""
        base = dataclasses.replace(
            HCFG, hash_levels=4, hash_base_res=4, hash_max_res=14,
            hash_log2_size=12,
        )
        params = init_hashgrid_params(
            jax.random.PRNGKey(0), dataclasses.replace(base, hash_impl="packed")
        )
        pts = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), minval=-1.0, maxval=1.0)
        out_p = hashgrid_encode(params, pts, dataclasses.replace(base, hash_impl="packed"))
        out_x = hashgrid_encode(params, pts, dataclasses.replace(base, hash_impl="xor"))
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-6)

    def test_lattice_params_deterministic_and_separated(self):
        from robust_nerf_tpu.models.hashgrid import lattice_params

        ky1, kz1 = lattice_params(1 << 12, seed=1001)
        ky2, kz2 = lattice_params(1 << 12, seed=1001)
        assert (ky1, kz1) == (ky2, kz2)
        assert ky1 % 2 == 1 and kz1 % 2 == 1

    def test_config_compat_missing_hash_impl_maps_to_xor(self):
        """Pre-round-5 hashgrid checkpoints (no hash_impl key) were trained
        under the XOR hash; config_from_dict must not misread them."""
        from robust_nerf_tpu.config import (
            NeRFConfig,
            config_from_dict,
            config_to_dict,
        )

        d = config_to_dict(NeRFConfig(model=HCFG))
        del d["model"]["hash_impl"]
        assert config_from_dict(d).model.hash_impl == "xor"
        # mlp configs keep the modern default
        d2 = config_to_dict(NeRFConfig())
        del d2["model"]["hash_impl"]
        assert config_from_dict(d2).model.hash_impl == "packed"
        # explicit value wins
        d3 = config_to_dict(NeRFConfig(model=HCFG))
        assert config_from_dict(d3).model.hash_impl == "packed"

    def test_anneal_gates_levels_under_packed(self):
        cfg = self.PCFG
        params = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
        pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
        out = hashgrid_encode(params, pts, cfg, anneal_alpha=0.0)
        F = cfg.hash_features
        # alpha=0 keeps level 0 (weight on level 0 is cos-gated but nonzero
        # only for level 0 per freq_anneal_weights contract)
        assert float(jnp.abs(out[:, F:]).max()) == 0.0
