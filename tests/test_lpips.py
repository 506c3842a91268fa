"""JAX LPIPS backend tests — weights-file gating + numerical check of the
conv/normalize/weight plumbing against an independent torch evaluation of
the same formula (Zhang et al. 2018) on a miniature random-weight net.

Reference contract: noisy_src/metrics.py:119-168 — LPIPSMetric.available
flips true when a backend exists, __call__ returns a float, callers skip
the metric when unavailable.
"""

import numpy as np
import pytest

from robust_nerf_tpu.evalx.metrics import LPIPSMetric


def _mini_weights(rng):
    """Miniature VGG-style archive: 3 stages, 1-2 convs each."""
    w = {
        "shift": rng.normal(0, 0.1, (1, 3, 1, 1)).astype(np.float32),
        "scale": rng.uniform(0.4, 0.6, (1, 3, 1, 1)).astype(np.float32),
    }
    stage_defs = [[(3, 8)], [(8, 12), (12, 12)], [(12, 16)]]
    for s, convs in enumerate(stage_defs):
        for i, (cin, cout) in enumerate(convs):
            w[f"conv{s}_{i}_w"] = (
                rng.normal(0, 0.3, (cout, cin, 3, 3)).astype(np.float32)
            )
            w[f"conv{s}_{i}_b"] = rng.normal(0, 0.1, (cout,)).astype(np.float32)
    for s, cout in enumerate([8, 12, 16]):
        w[f"lin{s}_w"] = rng.uniform(0, 1, (1, cout, 1, 1)).astype(np.float32)
    return w


@pytest.fixture()
def weights_file(tmp_path):
    rng = np.random.default_rng(0)
    path = tmp_path / "lpips_mini.npz"
    np.savez(path, **_mini_weights(rng))
    return path


def _torch_lpips(weights, a, b):
    """Independent torch evaluation of the LPIPS formula on the archive."""
    import torch
    import torch.nn.functional as F

    def prep(x):
        t = torch.from_numpy(np.asarray(x, np.float32)).permute(2, 0, 1)[None]
        return t * 2.0 - 1.0

    shift = torch.from_numpy(weights["shift"])
    scale = torch.from_numpy(weights["scale"])

    n_stages = len({k.split("_")[0] for k in weights if k.startswith("conv")})

    def feats(x):
        h = (x - shift) / scale
        out = []
        for s in range(n_stages):
            i = 0
            while f"conv{s}_{i}_w" in weights:
                h = F.conv2d(
                    h,
                    torch.from_numpy(weights[f"conv{s}_{i}_w"]),
                    torch.from_numpy(weights[f"conv{s}_{i}_b"]),
                    padding=1,
                )
                h = F.relu(h)
                i += 1
            out.append(h)
            if s < n_stages - 1:
                h = F.max_pool2d(h, 2)
        return out

    fa, fb = feats(prep(a)), feats(prep(b))
    total = 0.0
    for s, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / torch.sqrt((xa**2).sum(dim=1, keepdim=True) + 1e-10)
        nb = xb / torch.sqrt((xb**2).sum(dim=1, keepdim=True) + 1e-10)
        d = (na - nb) ** 2
        w = torch.from_numpy(weights[f"lin{s}_w"])
        total += float((w * d).sum(dim=1).mean())
    return total


def _vgg16_weights(rng):
    """Full VGG16 LPIPS layout at production channel widths (5 stages,
    2-2-3-3-3 convs, 64/128/256/512/512 taps) with random weights — the
    exact archive schema scripts/export_lpips_weights.py produces, so the
    layout-parsing + 5-stage forward path is what gets parity-checked."""
    w = {
        "shift": np.array([-0.030, -0.088, -0.188], np.float32).reshape(1, 3, 1, 1),
        "scale": np.array([0.458, 0.448, 0.450], np.float32).reshape(1, 3, 1, 1),
    }
    chans = [(3, 64, 2), (64, 128, 2), (128, 256, 3), (256, 512, 3), (512, 512, 3)]
    for s, (cin, cout, n) in enumerate(chans):
        ci = cin
        for i in range(n):
            w[f"conv{s}_{i}_w"] = (
                rng.normal(0, 0.08, (cout, ci, 3, 3)).astype(np.float32)
            )
            w[f"conv{s}_{i}_b"] = rng.normal(0, 0.05, (cout,)).astype(np.float32)
            ci = cout
        w[f"lin{s}_w"] = rng.uniform(0, 0.1, (1, cout, 1, 1)).astype(np.float32)
    return w


class TestGating:
    def test_unavailable_without_weights(self, monkeypatch, tmp_path):
        monkeypatch.setenv("LPIPS_WEIGHTS", str(tmp_path / "nonexistent.npz"))
        monkeypatch.chdir(tmp_path)
        m = LPIPSMetric()
        assert not m.available
        assert m(np.zeros((8, 8, 3)), np.ones((8, 8, 3))) is None

    def test_available_with_weights_file(self, monkeypatch, weights_file):
        """VERDICT round-1 item 5: availability flips true with a weights
        file on disk, no torch/lpips package needed."""
        monkeypatch.setenv("LPIPS_WEIGHTS", str(weights_file))
        m = LPIPSMetric()
        assert m.available
        rng = np.random.default_rng(1)
        a = rng.random((16, 16, 3), dtype=np.float32)
        val = m(a, a)
        assert isinstance(val, float)
        assert val == pytest.approx(0.0, abs=1e-6)


class TestNumerics:
    def test_matches_independent_torch_eval(self, monkeypatch, weights_file):
        monkeypatch.setenv("LPIPS_WEIGHTS", str(weights_file))
        m = LPIPSMetric()
        assert m._jax_model is not None
        rng = np.random.default_rng(2)
        a = rng.random((24, 24, 3), dtype=np.float32)
        b = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
        got = m(a, b)
        weights = dict(np.load(weights_file))
        ref = _torch_lpips(weights, a, b)
        np.testing.assert_allclose(got, ref, rtol=1e-5)
        assert got > 0

    def test_matches_torch_on_vgg16_layout(self, monkeypatch, tmp_path):
        """Parity at the PRODUCTION archive layout (5-stage VGG16 channel
        widths): the layout parser, stage taps, pools, and lin weighting
        must agree with an independent torch evaluation to 1e-5."""
        rng = np.random.default_rng(7)
        path = tmp_path / "lpips_vgg16_rand.npz"
        np.savez(path, **_vgg16_weights(rng))
        monkeypatch.setenv("LPIPS_WEIGHTS", str(path))
        m = LPIPSMetric()
        assert m.available
        a = rng.random((32, 32, 3), dtype=np.float32)
        b = np.clip(a + rng.normal(0, 0.15, a.shape), 0, 1).astype(np.float32)
        got = m(a, b)
        ref = _torch_lpips(dict(np.load(path)), a, b)
        np.testing.assert_allclose(got, ref, rtol=1e-5)
        assert got > 0
        assert m(a, a) == pytest.approx(0.0, abs=1e-7)

    def test_monotone_in_noise(self, monkeypatch, weights_file):
        monkeypatch.setenv("LPIPS_WEIGHTS", str(weights_file))
        m = LPIPSMetric()
        rng = np.random.default_rng(3)
        a = rng.random((24, 24, 3), dtype=np.float32)
        small = np.clip(a + rng.normal(0, 0.02, a.shape), 0, 1).astype(np.float32)
        large = np.clip(a + rng.normal(0, 0.4, a.shape), 0, 1).astype(np.float32)
        assert m(a, small) < m(a, large)
