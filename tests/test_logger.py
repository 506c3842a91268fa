"""Logger tests — CSV schema parity, summary.json keys, PNG naming."""

import csv
import json

import numpy as np

from robust_nerf_tpu.utils.logger import (
    CSVLogger,
    ExperimentLogger,
    TrainingMetrics,
    ValidationMetrics,
    depth_to_colormap,
)


class TestCSVLogger:
    def test_train_schema(self, tmp_path):
        """Column set matches the reference CSV header
        (outputs/*/logs/train_metrics.csv)."""
        log = CSVLogger(tmp_path, flush_every=1)
        log.log_train(TrainingMetrics(
            iteration=0, loss=0.5, loss_coarse=0.3, loss_fine=0.2, psnr=10.0,
            learning_rate=5e-4, time_per_iter=0.01, rays_per_sec=1e5,
        ))
        log.close()
        with open(tmp_path / "train_metrics.csv") as f:
            rows = list(csv.DictReader(f))
        assert list(rows[0].keys()) == [
            "iteration", "loss", "loss_coarse", "loss_fine", "psnr",
            "learning_rate", "time_per_iter", "rays_per_sec",
        ]

    def test_val_schema(self, tmp_path):
        log = CSVLogger(tmp_path, flush_every=1)
        log.log_val(ValidationMetrics(iteration=100, psnr=20.0, ssim=0.8, mse=0.01))
        log.close()
        with open(tmp_path / "val_metrics.csv") as f:
            rows = list(csv.DictReader(f))
        assert {"iteration", "psnr", "ssim", "mse"} <= set(rows[0].keys())

    def test_val_schema_ms_ssim_truly_appended(self, tmp_path):
        """ms_ssim must come AFTER the reference's column prefix
        (iteration,psnr,ssim,lpips,mse — noisy_src/logger.py:41-57) so
        position-based consumers of the reference layout keep working."""
        log = CSVLogger(tmp_path, flush_every=1)
        log.log_val(ValidationMetrics(
            iteration=100, psnr=20.0, ssim=0.8, lpips=0.1, mse=0.01,
            ms_ssim=0.9,
        ))
        log.close()
        with open(tmp_path / "val_metrics.csv") as f:
            header = f.readline().strip().split(",")
        assert header[:5] == ["iteration", "psnr", "ssim", "lpips", "mse"]
        assert header[5] == "ms_ssim"

    def test_buffered_rows_all_written(self, tmp_path):
        log = CSVLogger(tmp_path, flush_every=50)
        for i in range(123):
            log.log_train(TrainingMetrics(iteration=i, loss=0.1, loss_coarse=0.1))
        log.close()
        with open(tmp_path / "train_metrics.csv") as f:
            assert len(list(csv.DictReader(f))) == 123

    def test_append_resume_same_header(self, tmp_path):
        log = CSVLogger(tmp_path, flush_every=1)
        log.log_row("m", {"iteration": 0, "loss": 0.5})
        log.close()
        log2 = CSVLogger(tmp_path, flush_every=1, append=True)
        log2.log_row("m", {"iteration": 1, "loss": 0.4})
        log2.close()
        with open(tmp_path / "m.csv") as f:
            rows = list(csv.DictReader(f))
        assert [r["iteration"] for r in rows] == ["0", "1"]

    def test_append_resume_header_mismatch_rotates(self, tmp_path):
        """Resume with DIFFERENT metric keys (config/code change) must not
        append misaligned rows under the old header: the old file is
        rotated aside and a fresh one started."""
        log = CSVLogger(tmp_path, flush_every=1)
        log.log_row("m", {"iteration": 0, "loss": 0.5})
        log.close()
        log2 = CSVLogger(tmp_path, flush_every=1, append=True)
        log2.log_row("m", {"iteration": 1, "loss": 0.4, "psnr": 22.0})
        log2.close()
        with open(tmp_path / "m.csv") as f:
            rows = list(csv.DictReader(f))
        assert list(rows[0].keys()) == ["iteration", "loss", "psnr"]
        assert len(rows) == 1
        assert (tmp_path / "m.csv.old").exists()

    def test_second_mismatched_resume_keeps_first_rotation(self, tmp_path):
        """A second header-mismatched resume must not clobber the
        previously rotated history (unique .old/.old2/... names)."""
        log = CSVLogger(tmp_path, flush_every=1)
        log.log_row("m", {"iteration": 0, "loss": 0.5})
        log.close()
        log2 = CSVLogger(tmp_path, flush_every=1, append=True)
        log2.log_row("m", {"iteration": 1, "psnr": 22.0})
        log2.close()
        log3 = CSVLogger(tmp_path, flush_every=1, append=True)
        log3.log_row("m", {"iteration": 2, "ssim": 0.9})
        log3.close()
        with open(tmp_path / "m.csv.old") as f:
            rows = list(csv.DictReader(f))
        assert [r["iteration"] for r in rows] == ["0"]  # run A preserved
        with open(tmp_path / "m.csv.old2") as f:
            rows = list(csv.DictReader(f))
        assert [r["iteration"] for r in rows] == ["1"]  # run B preserved
        with open(tmp_path / "m.csv") as f:
            rows = list(csv.DictReader(f))
        assert list(rows[0].keys()) == ["iteration", "ssim"]


class TestExperimentLogger:
    def test_layout(self, tmp_path):
        exp = ExperimentLogger(tmp_path / "exp1", use_tensorboard=False)
        exp.log_config({"a": 1})
        exp.log_model_info("model_coarse", 100, 100)
        exp.log_training(TrainingMetrics(iteration=0, loss=1.0, loss_coarse=1.0))
        exp.log_validation(ValidationMetrics(iteration=0, psnr=15.0, ssim=0.5))
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        exp.log_images("val_0", img, img, iteration=7, depth=img[..., 0])
        exp.save_summary()
        exp.close()

        d = tmp_path / "exp1"
        assert (d / "config.json").exists()
        assert (d / "logs" / "train_metrics.csv").exists()
        assert (d / "images" / "val_0_pred_0000007.png").exists()
        assert (d / "images" / "val_0_gt_0000007.png").exists()
        assert (d / "images" / "val_0_comparison_0000007.png").exists()
        assert (d / "images" / "val_0_depth_0000007.png").exists()
        with open(d / "summary.json") as f:
            s = json.load(f)
        for k in ("experiment_name", "start_time", "end_time",
                  "total_time_seconds", "total_iterations",
                  "final_val_psnr", "final_val_ssim",
                  "best_val_psnr", "best_val_ssim",
                  "model_coarse_total_params"):
            assert k in s, k
        assert s["total_iterations"] == 1
        assert s["final_val_psnr"] == 15.0

    def test_best_tracking(self, tmp_path):
        exp = ExperimentLogger(tmp_path / "exp2", use_tensorboard=False)
        exp.log_validation(ValidationMetrics(iteration=0, psnr=20.0, ssim=0.7))
        exp.log_validation(ValidationMetrics(iteration=1, psnr=18.0, ssim=0.6))
        exp.save_summary()
        exp.close()
        with open(tmp_path / "exp2" / "summary.json") as f:
            s = json.load(f)
        assert s["best_val_psnr"] == 20.0
        assert s["final_val_psnr"] == 18.0


class TestDepthColormap:
    def test_shape_and_range(self):
        depth = np.linspace(2, 6, 64).reshape(8, 8)
        cm = depth_to_colormap(depth)
        assert cm.shape == (8, 8, 3)
        assert cm.min() >= 0.0 and cm.max() <= 1.0

    def test_constant_depth_no_nan(self):
        cm = depth_to_colormap(np.full((4, 4), 3.0))
        assert np.all(np.isfinite(cm))
