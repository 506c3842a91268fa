"""Tests for AverageMeter / EarlyStopping (reference utils parity)."""

from robust_nerf_tpu.utils.train_utils import AverageMeter, EarlyStopping


class TestAverageMeter:
    def test_running_average(self):
        m = AverageMeter("loss")
        for v in (1.0, 2.0, 3.0):
            m.update(v)
        assert m.avg == 2.0
        assert m.val == 3.0
        assert m.count == 3

    def test_weighted_update(self):
        m = AverageMeter()
        m.update(1.0, n=3)
        m.update(5.0, n=1)
        assert m.avg == 2.0

    def test_reset(self):
        m = AverageMeter()
        m.update(10.0)
        m.reset()
        assert m.avg == 0.0 and m.count == 0


class TestEarlyStopping:
    def test_stops_after_patience(self):
        es = EarlyStopping(patience=3, mode="max")
        assert not es.step(10.0)
        for _ in range(2):
            assert not es.step(9.0)
        assert es.step(9.0)       # third non-improvement
        assert es.should_stop

    def test_improvement_resets(self):
        es = EarlyStopping(patience=2, mode="max")
        es.step(1.0)
        es.step(0.5)
        es.step(2.0)              # improvement resets counter
        assert es.counter == 0
        assert not es.should_stop

    def test_min_mode(self):
        es = EarlyStopping(patience=2, mode="min")
        es.step(1.0)
        assert not es.step(0.5)   # improvement (lower)
        assert not es.step(0.6)
        assert es.step(0.7)

    def test_min_delta(self):
        es = EarlyStopping(patience=1, mode="max", min_delta=0.5)
        es.step(1.0)
        assert es.step(1.2)       # +0.2 < min_delta -> no improvement


class TestEarlyStopWired:
    def test_training_stops_early(self, tmp_path):
        """--early_stop_patience halts the loop once val PSNR plateaus
        (lr 0 makes every validation identical, so patience 1 stops at
        the second val instead of running all 200 iters)."""
        from robust_nerf_tpu.training.train import main

        main([
            "--data_source", "synthetic", "--num_iters", "200",
            "--val_every", "20", "--save_every", "200", "--log_every", "20",
            "--batch_size", "64", "--num_samples", "8",
            "--num_samples_fine", "8", "--steps_per_scan", "20",
            "--lr", "0.0", "--early_stop_patience", "1",
            "--output_dir", str(tmp_path), "--exp_name", "es",
        ])
        import json

        with open(tmp_path / "es" / "summary.json") as f:
            summary = json.load(f)
        assert summary["total_iterations"] <= 60
