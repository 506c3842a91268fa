"""Dispatch-ahead frame pipelining (utils/pipeline.py).

The pipelined loops must be observably identical to the serial loops they
replaced (reference: noisy_src/inference.py:364-408, train.py:163-233) —
same consume calls, same artifacts, bit-identical pixels.
"""

import numpy as np
import pytest

from robust_nerf_tpu.utils.pipeline import pipeline_frames


class TestPipelineFrames:
    def test_consumes_every_frame_in_order(self):
        events = []
        pipeline_frames(
            4,
            dispatch=lambda i: (events.append(("d", i)), i * 10)[1],
            consume=lambda i, out: events.append(("c", i, out)),
        )
        assert [e for e in events if e[0] == "c"] == [
            ("c", 0, 0), ("c", 1, 10), ("c", 2, 20), ("c", 3, 30)
        ]
        # dispatch(i+1) happens BEFORE consume(i) — the overlap contract
        assert events.index(("d", 1)) < events.index(("c", 0, 0))
        assert events.index(("d", 3)) < events.index(("c", 2, 20))

    def test_zero_and_one_frame(self):
        calls = []
        pipeline_frames(0, dispatch=lambda i: i, consume=lambda i, o: calls.append(i))
        assert calls == []
        pipeline_frames(1, dispatch=lambda i: i + 7, consume=lambda i, o: calls.append((i, o)))
        assert calls == [(0, 7)]

    def test_matches_serial_loop(self):
        serial, piped = [], []
        work = lambda i: {"v": i * i}  # noqa: E731
        for i in range(5):
            serial.append((i, work(i)["v"]))
        pipeline_frames(5, work, lambda i, o: piped.append((i, o["v"])))
        assert piped == serial


class TestRenderVideoPipelined:
    def test_video_frames_match_direct_renders(self, tiny_config, tiny_scene, tmp_path):
        """render_video's pipelined loop writes the same frames as direct
        render_image calls on the same poses."""
        import jax
        from PIL import Image

        from robust_nerf_tpu.evalx.inference import create_spiral_poses, render_video
        from robust_nerf_tpu.ops.rendering import render_image
        from robust_nerf_tpu.training.steps import create_train_state
        from robust_nerf_tpu.utils.logger import save_png

        cfg = tiny_config
        models = create_train_state(jax.random.PRNGKey(0), cfg).models
        poses = create_spiral_poses(n_frames=3)
        H = W = int(tiny_scene.H)
        focal = float(tiny_scene.focal)

        render_video(models, cfg, poses, H, W, focal, tmp_path / "vid", fps=5)

        for i in range(3):
            out = render_image(
                models, poses[i], H, W, focal, cfg.render, cfg.model, cfg.tpu
            )
            save_png(np.asarray(out["rgb"]), tmp_path / f"direct_{i}.png")
            a = np.asarray(Image.open(tmp_path / "vid" / "frames" / f"frame_{i:04d}.png"))
            b = np.asarray(Image.open(tmp_path / f"direct_{i}.png"))
            np.testing.assert_array_equal(a, b)


class TestEvaluatePipelined:
    def test_evaluate_test_set_artifacts_and_metrics(self, tiny_config, tiny_val_scene, tmp_path):
        import jax

        from robust_nerf_tpu.evalx.inference import evaluate_test_set
        from robust_nerf_tpu.evalx.metrics import compute_psnr
        from robust_nerf_tpu.ops.rendering import render_image
        from robust_nerf_tpu.training.steps import create_train_state

        cfg = tiny_config
        models = create_train_state(jax.random.PRNGKey(0), cfg).models
        agg = evaluate_test_set(models, cfg, tiny_val_scene, tmp_path)
        assert agg["num_images"] == 2
        assert (tmp_path / "test_images" / "test_000_pred.png").exists()
        assert (tmp_path / "test_images" / "test_001_depth.png").exists()
        assert (tmp_path / "per_image_metrics.json").exists()

        # the pipelined metrics match a direct serial render+PSNR
        out = render_image(
            models, tiny_val_scene.poses[0], tiny_val_scene.H, tiny_val_scene.W,
            tiny_val_scene.focal, cfg.render, cfg.model, cfg.tpu,
        )
        direct = float(
            compute_psnr(np.asarray(out["rgb"]), np.asarray(tiny_val_scene.images[0]))
        )
        import json

        per_image = json.loads((tmp_path / "per_image_metrics.json").read_text())
        assert per_image[0]["psnr"] == pytest.approx(direct, abs=1e-5)
        assert per_image[0]["render_time"] > 0

    def test_training_evaluate_matches_serial_math(self, tiny_config, tiny_val_scene):
        import jax

        from robust_nerf_tpu.evalx.metrics import compute_psnr, compute_ssim
        from robust_nerf_tpu.ops.rendering import render_image
        from robust_nerf_tpu.training.evaluation import evaluate
        from robust_nerf_tpu.training.steps import create_train_state

        cfg = tiny_config
        models = create_train_state(jax.random.PRNGKey(0), cfg).models
        val = evaluate(models, tiny_val_scene, None, 0, cfg, num_images=2)

        psnrs, ssims = [], []
        for i in range(2):
            out = render_image(
                models, tiny_val_scene.poses[i], tiny_val_scene.H,
                tiny_val_scene.W, tiny_val_scene.focal,
                cfg.render, cfg.model, cfg.tpu,
            )
            pred = np.asarray(out["rgb"])
            target = np.asarray(tiny_val_scene.images[i])
            psnrs.append(float(compute_psnr(pred, target)))
            ssims.append(float(compute_ssim(pred, target)))
        assert val.psnr == pytest.approx(float(np.mean(psnrs)), abs=1e-5)
        assert val.ssim == pytest.approx(float(np.mean(ssims)), abs=1e-5)
