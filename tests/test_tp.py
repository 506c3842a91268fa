"""Tensor (model) parallelism — parallel/tp.py.

The reference is single-GPU (no model-parallel analog; SURVEY.md §5.8);
this validates the TPU-native second scaling axis: Megatron-style
alternating column/row sharding of the MLP hidden dim over the 'model'
axis of a 2-D (data, model) mesh, pure GSPMD placement (no hand-written
collectives). The key invariant is exactness: tensor-sharding a matmul
changes only WHERE partial sums are computed, so a tp run must match the
single-device run to float tolerance, step for step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from robust_nerf_tpu.config import (
    DataConfig,
    ModelConfig,
    NeRFConfig,
    PoseOptConfig,
    RenderConfig,
    TPUConfig,
    TrainConfig,
)
from robust_nerf_tpu.data.banks import build_pixel_bank, build_ray_bank
from robust_nerf_tpu.data.synthetic import make_synthetic_scene
from robust_nerf_tpu.parallel.mesh import replicate
from robust_nerf_tpu.parallel.tp import (
    MODEL_AXIS,
    create_mesh_2d,
    model_axis_size,
    nerf_param_specs,
    shard_models,
    shard_pose_opt_state,
    shard_train_state,
)
from robust_nerf_tpu.training.steps import (
    create_pose_opt_state,
    create_train_state,
    make_pose_opt_chunk,
    make_train_chunk,
)


def tiny_cfg(batch=32, hidden=32, layers=4, skips=(1,)):
    return NeRFConfig(
        model=ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=hidden,
                          num_hidden_layers=layers, skips=skips),
        render=RenderConfig(num_samples=8, num_samples_fine=8),
        data=DataConfig(batch_size=batch, source="synthetic"),
        train=TrainConfig(seed=0),
        pose_opt=PoseOptConfig(pose_opt_delay=0),
        tpu=TPUConfig(steps_per_scan=1),
    )


class TestSpecs:
    def test_megatron_alternation_default_arch(self):
        """Reference architecture (8x256, skip after 4): col/row pairs,
        replicated skip layer, row-parallel heads off the sharded trunk."""
        cfg = ModelConfig()  # 8 layers, hidden 256, skips=(4,)
        specs = nerf_param_specs(cfg, model_size=2)
        assert specs["trunk_0_w"] == P(None, MODEL_AXIS)
        assert specs["trunk_1_w"] == P(MODEL_AXIS, None)
        assert specs["trunk_2_w"] == P(None, MODEL_AXIS)
        assert specs["trunk_3_w"] == P(MODEL_AXIS, None)
        assert specs["trunk_4_w"] == P()          # skip layer: replicated
        assert specs["trunk_5_w"] == P(None, MODEL_AXIS)
        assert specs["trunk_6_w"] == P(MODEL_AXIS, None)
        assert specs["trunk_7_w"] == P(None, MODEL_AXIS)
        # trunk output sharded -> heads contract it row-parallel
        assert specs["sigma_w"] == P(MODEL_AXIS, None)
        assert specs["feat_w"] == P(MODEL_AXIS, None)
        assert specs["dir_w"] == P(None, MODEL_AXIS)
        assert specs["rgb_w"] == P(MODEL_AXIS, None)

    def test_row_parallel_biases_replicated(self):
        specs = nerf_param_specs(ModelConfig(), model_size=2)
        assert specs["trunk_1_b"] == P()
        assert specs["trunk_0_b"] == P(MODEL_AXIS)

    def test_indivisible_dims_fall_back_replicated(self):
        cfg = ModelConfig(hidden_dim=30, num_hidden_layers=2, skips=())
        specs = nerf_param_specs(cfg, model_size=4)
        assert all(s == P() for s in specs.values())

    def test_model_size_one_is_fully_replicated(self):
        specs = nerf_param_specs(ModelConfig(), model_size=1)
        assert all(s == P() for s in specs.values())

    def test_sharded_input_skip_layer_is_row_parallel(self):
        """A skip layer whose input is sharded must end replicated via a
        row-parallel contraction so the skip-concat stays replicated."""
        cfg = ModelConfig(hidden_dim=32, num_hidden_layers=3, skips=(1,))
        specs = nerf_param_specs(cfg, model_size=2)
        assert specs["trunk_0_w"] == P(None, MODEL_AXIS)
        assert specs["trunk_1_w"] == P(MODEL_AXIS, None)  # skip + sharded in
        assert specs["trunk_2_w"] == P(None, MODEL_AXIS)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
class TestTPTraining:
    def test_train_matches_single_device(self):
        """5 scanned steps on a (2 data, 4 model) mesh == single-device,
        to float tolerance (sharding only moves partial-sum locations)."""
        cfg = tiny_cfg()
        scene = make_synthetic_scene(num_images=4, resolution=16,
                                     num_samples=32)
        bank, _, _ = build_ray_bank(scene)

        ref_state = create_train_state(jax.random.PRNGKey(0), cfg)
        ref_chunk = make_train_chunk(cfg, mesh=None, steps=5)
        ref_state, ref_metrics = ref_chunk(ref_state, bank,
                                           jax.random.PRNGKey(1))

        mesh = create_mesh_2d(2, 4)
        assert model_axis_size(mesh) == 4
        tp_state = shard_train_state(
            create_train_state(jax.random.PRNGKey(0), cfg), mesh, cfg
        )
        tp_chunk = make_train_chunk(cfg, mesh=mesh, steps=5)
        tp_state, tp_metrics = tp_chunk(tp_state, replicate(bank, mesh),
                                        jax.random.PRNGKey(1))

        np.testing.assert_allclose(
            np.asarray(tp_metrics["loss"]), np.asarray(ref_metrics["loss"]),
            rtol=2e-5, atol=2e-6,
        )
        for name in ref_state.models:
            for k, v in ref_state.models[name].items():
                np.testing.assert_allclose(
                    np.asarray(tp_state.models[name][k]), np.asarray(v),
                    rtol=2e-4, atol=2e-5,
                    err_msg=f"{name}/{k} diverged under tp",
                )

    def test_params_actually_sharded(self):
        cfg = tiny_cfg()
        mesh = create_mesh_2d(2, 4)
        models = shard_models(
            create_train_state(jax.random.PRNGKey(0), cfg).models, mesh,
            cfg.model,
        )
        w = models["coarse"]["trunk_0_w"]  # column-parallel
        # 4-way sharded on the output dim: each shard holds 1/4 of cols
        shard_shapes = {s.data.shape for s in w.addressable_shards}
        assert shard_shapes == {(w.shape[0], w.shape[1] // 4)}

    def test_optimizer_moments_inherit_sharding(self):
        cfg = tiny_cfg()
        mesh = create_mesh_2d(2, 4)
        state = shard_train_state(
            create_train_state(jax.random.PRNGKey(0), cfg), mesh, cfg
        )
        leaves = jax.tree_util.tree_leaves_with_path(state.opt_state)
        mu_w = [
            leaf for path, leaf in leaves
            if any(isinstance(k, jax.tree_util.DictKey)
                   and k.key == "trunk_0_w" for k in path)
        ]
        assert mu_w, "no adam moments found for trunk_0_w"
        for m in mu_w:
            assert {s.data.shape for s in m.addressable_shards} == {
                (m.shape[0], m.shape[1] // 4)
            }

    def test_pose_opt_step_under_tp(self):
        """Joint pose-opt: MLPs tensor-sharded, pose grads still flow."""
        from robust_nerf_tpu.core.noise import NoiseConfig, add_noise_to_poses

        cfg = tiny_cfg()
        scene = make_synthetic_scene(num_images=4, resolution=16,
                                     num_samples=32)
        noisy, _ = add_noise_to_poses(
            scene.poses, NoiseConfig(rotation_noise_deg=2.0, seed=0)
        )
        mesh = create_mesh_2d(4, 2)
        state = shard_pose_opt_state(
            create_pose_opt_state(jax.random.PRNGKey(0), cfg,
                                  jnp.asarray(noisy)),
            mesh, cfg,
        )
        chunk = make_pose_opt_chunk(cfg, mesh=mesh, steps=2)
        bank = replicate(build_pixel_bank(scene), mesh)
        state, metrics = chunk(state, bank, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"][-1]))
        assert float(
            jnp.linalg.norm(state.pose_params["rotation_deltas"])
        ) > 0.0

    def test_train_cli_tensor_parallel(self, tmp_path):
        """--tensor_parallel 2 drives the full orchestrator (train + val
        render + checkpoint) on a (4 data, 2 model) mesh."""
        from robust_nerf_tpu.training.train import main

        main([
            "--data_source", "synthetic", "--num_iters", "20",
            "--val_every", "20", "--save_every", "20", "--log_every", "10",
            "--batch_size", "128", "--num_samples", "8",
            "--num_samples_fine", "8", "--steps_per_scan", "10",
            "--tensor_parallel", "2",
            "--output_dir", str(tmp_path), "--exp_name", "tp_smoke",
        ])
        out = tmp_path / "tp_smoke"
        assert (out / "summary.json").exists()
        assert (out / "checkpoint_latest.npz").exists()
        import json

        with open(out / "config.json") as f:
            cfg = json.load(f)
        assert cfg["tpu"]["tensor_parallel"] == 2

    def test_tensor_parallel_must_divide_devices(self):
        from robust_nerf_tpu.config import TPUConfig
        from robust_nerf_tpu.parallel.tp import mesh_for

        with pytest.raises(ValueError, match="must divide"):
            mesh_for(TPUConfig(tensor_parallel=3))

    def test_tp_composes_with_microbatching(self):
        cfg = tiny_cfg(batch=64)
        cfg = dataclasses.replace(
            cfg, tpu=dataclasses.replace(cfg.tpu, microbatch=16)
        )
        scene = make_synthetic_scene(num_images=4, resolution=16,
                                     num_samples=32)
        bank, _, _ = build_ray_bank(scene)
        mesh = create_mesh_2d(2, 4)
        state = shard_train_state(
            create_train_state(jax.random.PRNGKey(0), cfg), mesh, cfg
        )
        chunk = make_train_chunk(cfg, mesh=mesh, steps=2)
        state, metrics = chunk(state, replicate(bank, mesh),
                               jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"][-1]))
