"""Direct numerical parity against the ACTUAL reference implementation.

Every other parity test in this suite checks recorded golden values; these
tests go further: when the reference checkout is present on disk (and torch
is importable), they load the reference package itself under an alias and
assert that our JAX implementations agree with the reference's torch
implementations on the same inputs — including an exact-forward MLP check
that transplants our parameter pytree into the reference's nn.Module.

Skipped cleanly when /root/reference or torch is unavailable, so the suite
stays hermetic outside this environment. No reference code is copied; the
reference is only *called*.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

REF_ROOT = Path("/root/reference/noisy_src")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not REF_ROOT.exists(), reason="reference checkout not on disk"
)


@pytest.fixture(scope="module")
def ref():
    """The reference package, importable as `refsrc` (aliased so it cannot
    collide with our own `noisy_src` compat package)."""
    if "refsrc" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "refsrc",
            REF_ROOT / "__init__.py",
            submodule_search_locations=[str(REF_ROOT)],
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["refsrc"] = mod
        spec.loader.exec_module(mod)
    import refsrc  # noqa: F401
    import refsrc.rendering  # registers submodule
    import refsrc.train_pose_opt

    return sys.modules["refsrc"]


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


class TestEncodingAndModel:
    def test_positional_encoding_matches(self, ref):
        from robust_nerf_tpu.models.nerf import positional_encoding

        rng = np.random.default_rng(0)
        x = rng.normal(size=(64, 3)).astype(np.float32)
        enc_ref = ref.PositionalEncoding(num_freqs=10)(_t(x)).numpy()
        enc_ours = np.asarray(positional_encoding(x, 10))
        # identical band layout: [x, sin f0, cos f0, sin f1, ...]
        np.testing.assert_allclose(enc_ours, enc_ref, rtol=1e-6, atol=1e-5)

    def test_mlp_forward_exact_weight_transplant(self, ref):
        """Transplant OUR param pytree into the reference NeRF nn.Module and
        require identical (rgb, sigma) on the same inputs — proves layer
        topology, skip wiring, head order, and activations all match
        (reference: model.py:83-196)."""
        import jax

        from robust_nerf_tpu.config import ModelConfig
        from robust_nerf_tpu.models.nerf import init_nerf_params, nerf_apply

        cfg = ModelConfig(sigma_activation="relu")  # strict-parity mode
        params = init_nerf_params(jax.random.PRNGKey(3), cfg)

        ref_model = ref.NeRF()  # reference defaults == ModelConfig defaults
        state = {}
        for i in range(cfg.num_hidden_layers):
            state[f"pts_linears.{i}.weight"] = _t(params[f"trunk_{i}_w"]).T
            state[f"pts_linears.{i}.bias"] = _t(params[f"trunk_{i}_b"])
        for ours, theirs in [("sigma", "sigma_linear"), ("feat", "feature_linear"),
                             ("dir", "dir_linear"), ("rgb", "rgb_linear")]:
            state[f"{theirs}.weight"] = _t(params[f"{ours}_w"]).T
            state[f"{theirs}.bias"] = _t(params[f"{ours}_b"])
        # strict=False: keep the module's own freq_bands buffers
        missing, unexpected = ref_model.load_state_dict(state, strict=False)
        assert not unexpected and all("freq_bands" in k for k in missing)

        rng = np.random.default_rng(1)
        pts = rng.uniform(-2, 2, size=(256, 3)).astype(np.float32)
        dirs = rng.normal(size=(256, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

        with torch.no_grad():
            rgb_ref, sigma_ref = ref_model(_t(pts), _t(dirs))
        rgb_ours, sigma_ours = nerf_apply(params, pts, dirs, cfg)

        np.testing.assert_allclose(
            np.asarray(rgb_ours), rgb_ref.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(sigma_ours), sigma_ref.numpy(), rtol=1e-4, atol=1e-4
        )


class TestGeometry:
    def test_ray_directions_match(self, ref):
        from robust_nerf_tpu.core.rays import get_ray_directions

        d_ref = ref.get_ray_directions(12, 16, 20.0).numpy()
        d_ours = np.asarray(get_ray_directions(12, 16, 20.0))
        np.testing.assert_allclose(d_ours, d_ref, rtol=1e-6, atol=1e-6)

    def test_get_rays_match(self, ref):
        from robust_nerf_tpu.core.rays import get_ray_directions, get_rays

        rng = np.random.default_rng(2)
        # a random valid c2w: orthonormal rotation + translation
        q = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = q * np.sign(np.linalg.det(q))
        c2w[:3, 3] = rng.normal(size=3)

        dirs = get_ray_directions(8, 8, 10.0)
        o_ref, d_ref = ref.get_rays(_t(np.asarray(dirs)), _t(c2w))
        o_ours, d_ours = get_rays(dirs, c2w)
        np.testing.assert_allclose(np.asarray(o_ours).reshape(-1, 3),
                                   o_ref.numpy().reshape(-1, 3),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d_ours).reshape(-1, 3),
                                   d_ref.numpy().reshape(-1, 3),
                                   rtol=1e-5, atol=1e-5)

    def test_stratified_sampling_deterministic_match(self, ref):
        from robust_nerf_tpu.core.rays import sample_along_rays

        rng = np.random.default_rng(3)
        rays_o = rng.normal(size=(32, 3)).astype(np.float32)
        rays_d = rng.normal(size=(32, 3)).astype(np.float32)
        pts_ref, z_ref = ref.sample_along_rays(
            _t(rays_o), _t(rays_d), 2.0, 6.0, 64, perturb=False
        )
        pts_ours, z_ours = sample_along_rays(
            None, rays_o, rays_d, 2.0, 6.0, 64, perturb=False
        )
        np.testing.assert_allclose(np.asarray(z_ours), z_ref.numpy(),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pts_ours), pts_ref.numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_sample_pdf_det_match(self, ref):
        """Our masked-reduction CDF inversion == reference searchsorted
        inversion, deterministic mode (reference: rays.py:213-279)."""
        import refsrc.rays as ref_rays

        from robust_nerf_tpu.core.rays import sample_pdf

        rng = np.random.default_rng(4)
        bins = np.sort(rng.uniform(2, 6, size=(16, 63)), axis=-1).astype(np.float32)
        weights = rng.uniform(0, 1, size=(16, 62)).astype(np.float32)
        s_ref = ref_rays.sample_pdf(_t(bins), _t(weights), 128, det=True).numpy()
        s_ours = np.asarray(sample_pdf(None, bins, weights, 128, det=True))
        np.testing.assert_allclose(s_ours, s_ref, rtol=1e-4, atol=1e-4)


class TestRenderingAndMetrics:
    def test_raw2outputs_match(self, ref):
        import refsrc.rendering as ref_rendering

        from robust_nerf_tpu.ops.rendering import raw2outputs

        rng = np.random.default_rng(5)
        n, s = 24, 48
        rgb = rng.uniform(size=(n, s, 3)).astype(np.float32)
        sigma = (rng.uniform(size=(n, s)) * 30).astype(np.float32)
        z = np.sort(rng.uniform(2, 6, size=(n, s)), axis=-1).astype(np.float32)
        rays_d = rng.normal(size=(n, 3)).astype(np.float32)

        out_ref = ref_rendering.raw2outputs(
            _t(rgb), _t(sigma), _t(z), _t(rays_d),
            raw_noise_std=0.0, white_background=True,
        )
        out_ours = raw2outputs(rgb, sigma, z, rays_d, white_background=True)
        for k in ("rgb_map", "depth_map", "acc_map", "weights"):
            np.testing.assert_allclose(
                np.asarray(out_ours[k]), out_ref[k].numpy(),
                rtol=1e-4, atol=1e-5, err_msg=k,
            )

    def test_ssim_match(self, ref):
        import refsrc.metrics as ref_metrics

        from robust_nerf_tpu.evalx.metrics import compute_ssim

        rng = np.random.default_rng(6)
        a = rng.uniform(size=(48, 48, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(scale=0.08, size=a.shape), 0, 1).astype(np.float32)
        s_ref = float(ref_metrics.compute_ssim(_t(a), _t(b)))
        s_ours = float(compute_ssim(a, b))
        assert abs(s_ours - s_ref) < 5e-5, (s_ours, s_ref)

    def test_psnr_match(self, ref):
        import refsrc.metrics as ref_metrics

        from robust_nerf_tpu.evalx.metrics import compute_psnr

        rng = np.random.default_rng(7)
        a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        b = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        assert abs(float(compute_psnr(a, b)) -
                   float(ref_metrics.compute_psnr(_t(a), _t(b)))) < 1e-3


class TestPoseMath:
    def test_exp_map_pose_composition_match(self, ref):
        """apply_pose_deltas == reference CameraPoseParameters.get_poses for
        the same (rotation_deltas, translation_deltas), including angles
        near the small-angle guard (reference: train_pose_opt.py:122-226)."""
        import refsrc.train_pose_opt as ref_tpo

        from robust_nerf_tpu.core.se3 import apply_pose_deltas

        rng = np.random.default_rng(8)
        n = 6
        qs = [np.linalg.qr(rng.normal(size=(3, 3)))[0] for _ in range(n)]
        poses = np.stack([np.eye(4, dtype=np.float32)] * n)
        for i, q in enumerate(qs):
            poses[i, :3, :3] = (q * np.sign(np.linalg.det(q))).astype(np.float32)
            poses[i, :3, 3] = rng.normal(size=3)

        rot_d = (rng.normal(size=(n, 3)) * 0.05).astype(np.float32)
        rot_d[0] = 0.0                      # exactly at the exp-map origin
        rot_d[1] = np.array([1e-8, 0, 0])   # inside the small-angle guard
        trans_d = (rng.normal(size=(n, 3)) * 0.1).astype(np.float32)

        cam = ref_tpo.CameraPoseParameters(_t(poses))
        with torch.no_grad():
            cam.rotation_deltas.data = _t(rot_d)
            cam.translation_deltas.data = _t(trans_d)
            p_ref = cam.get_poses().numpy()
        p_ours = np.asarray(apply_pose_deltas(poses, rot_d, trans_d))
        np.testing.assert_allclose(p_ours, p_ref, rtol=1e-5, atol=1e-6)

    def test_pose_error_match(self, ref):
        from robust_nerf_tpu.core.noise import compute_pose_error

        rng = np.random.default_rng(9)
        q1, q2 = (np.linalg.qr(rng.normal(size=(3, 3)))[0] for _ in range(2))
        a, b = np.eye(4, dtype=np.float32), np.eye(4, dtype=np.float32)
        a[:3, :3] = q1 * np.sign(np.linalg.det(q1))
        b[:3, :3] = q2 * np.sign(np.linalg.det(q2))
        a[:3, 3], b[:3, 3] = rng.normal(size=3), rng.normal(size=3)

        e_ref = ref.compute_pose_error(_t(a), _t(b))
        e_ours = compute_pose_error(a, b)
        assert abs(e_ours["rotation_error_deg"] - e_ref["rotation_error_deg"]) < 1e-3
        assert abs(e_ours["translation_error"] - e_ref["translation_error"]) < 1e-5
