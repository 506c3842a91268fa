"""AOT serving-artifact export (evalx/export.py).

The exported StableHLO tile renderer must reproduce the in-process
render_rays eval path exactly, survive a blind pure-jax deserialize, pad
unaligned ray counts correctly, and round-trip through the CLI from a real
checkpoint. (The reference has no serving export — this is TPU-native
deployment surface; closest reference behavior is the checkpoint rebuild in
noisy_src/inference.py:33-72.)
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_nerf_tpu.config import (
    DataConfig,
    ModelConfig,
    NeRFConfig,
    RenderConfig,
    TPUConfig,
    TrainConfig,
    config_to_dict,
)
from robust_nerf_tpu.evalx.export import (
    load_serving_artifact,
    save_serving_artifact,
)
from robust_nerf_tpu.models.nerf import create_nerf
from robust_nerf_tpu.ops.rendering import render_rays

SMALL = ModelConfig(
    pos_freqs=4, dir_freqs=2, hidden_dim=32, num_hidden_layers=2, skips=(1,)
)
RCFG = RenderConfig(num_samples=8, num_samples_fine=8)
TILE = 32


def _rays(n, seed=0):
    key = jax.random.PRNGKey(seed)
    rays_o = jnp.zeros((n, 3)).at[:, 2].set(4.0)
    rays_d = jax.random.normal(key, (n, 3)) * 0.05 - jnp.array([0.0, 0.0, 1.0])
    return rays_o, rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def models():
    return create_nerf(jax.random.PRNGKey(0), SMALL)


@pytest.fixture(scope="module")
def artifact(models, tmp_path_factory):
    out = tmp_path_factory.mktemp("serving")
    return save_serving_artifact(out, models, SMALL, RCFG, tile=TILE)


def test_roundtrip_matches_direct_render(models, artifact):
    srv = load_serving_artifact(artifact)
    rays_o, rays_d = _rays(TILE)
    got = srv.render(rays_o, rays_d)
    want = render_rays(
        models, rays_o, rays_d, None, RCFG, SMALL, is_train=False
    )
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(
            got[k], np.asarray(want[k]), rtol=1e-5, atol=1e-5, err_msg=k
        )


def test_unaligned_ray_count_pads(models, artifact):
    srv = load_serving_artifact(artifact)
    n = 2 * TILE + 7   # forces padding in the last tile
    rays_o, rays_d = _rays(n, seed=1)
    got = srv.render(rays_o, rays_d)
    want = render_rays(
        models, rays_o, rays_d, None, RCFG, SMALL, is_train=False
    )
    assert got["rgb_fine"].shape == (n, 3)
    np.testing.assert_allclose(
        got["rgb_fine"], np.asarray(want["rgb_fine"]), rtol=1e-5, atol=1e-5
    )


def test_pure_jax_consumer(artifact):
    """Drive the artifact the way a serving process would: only jax + the
    three files, none of this package's loaders."""
    from jax import export as jexport

    exported = jexport.deserialize(
        (artifact / "renderer.jaxexport").read_bytes()
    )
    meta = json.loads((artifact / "meta.json").read_text())
    z = np.load(artifact / "params.npz")
    params = tuple(z[n] for n in meta["leaf_names"])
    rays_o, rays_d = _rays(TILE)
    out = exported.call(params, np.asarray(rays_o), np.asarray(rays_d))
    assert np.isfinite(np.asarray(out["rgb_fine"])).all()
    assert np.asarray(out["rgb_fine"]).shape == (TILE, 3)


def test_meta_contents(artifact):
    meta = json.loads((artifact / "meta.json").read_text())
    assert meta["artifact_version"] == 1
    assert meta["tile"] == TILE
    assert "cpu" in meta["platforms"]
    assert meta["model_config"]["hidden_dim"] == 32
    assert meta["num_leaves"] == len(meta["leaf_names"])


def test_params_swap_serves_new_checkpoint(models, artifact):
    """One artifact serves any checkpoint of the same architecture: swap the
    params tuple, get that model's render."""
    srv = load_serving_artifact(artifact)
    other = create_nerf(jax.random.PRNGKey(7), SMALL)
    leaves, _ = jax.tree_util.tree_flatten(other)
    srv.params = tuple(np.asarray(l) for l in leaves)
    rays_o, rays_d = _rays(TILE, seed=2)
    got = srv.render(rays_o, rays_d)
    want = render_rays(other, rays_o, rays_d, None, RCFG, SMALL, is_train=False)
    np.testing.assert_allclose(
        got["rgb_fine"], np.asarray(want["rgb_fine"]), rtol=1e-5, atol=1e-5
    )


def test_frame_artifact_matches_chunked_render(models, tmp_path):
    """Frame-kind export: whole (H, W) frame from one compiled call, equal
    to the in-process ray-gen + chunked render at the same tile."""
    from robust_nerf_tpu.core.rays import get_ray_directions, get_rays
    from robust_nerf_tpu.ops.rendering import render_rays_chunked

    H, W, focal = 24, 20, 18.0
    out = save_serving_artifact(
        tmp_path / "frame", models, SMALL, RCFG, tile=TILE, frame=(H, W)
    )
    srv = load_serving_artifact(out)
    assert srv.kind == "frame"

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.0
    got = srv.render_frame(pose, focal)
    assert got["rgb"].shape == (H, W, 3)
    assert got["depth"].shape == (H, W)

    dirs = get_ray_directions(H, W, focal)
    rays_o, rays_d = get_rays(dirs, jnp.asarray(pose))
    want = render_rays_chunked(
        models, rays_o.reshape(-1, 3), rays_d.reshape(-1, 3), None,
        RCFG, SMALL, is_train=False, tile=TILE,
    )
    np.testing.assert_allclose(
        got["rgb"],
        np.asarray(want["rgb_fine"]).reshape(H, W, 3),
        rtol=1e-5, atol=1e-5,
    )

    # kind guards: the wrong entry point raises
    with pytest.raises(ValueError):
        srv.render(np.zeros((TILE, 3)), np.zeros((TILE, 3)))
    tile_srv = load_serving_artifact(
        save_serving_artifact(tmp_path / "tile", models, SMALL, RCFG, tile=TILE)
    )
    with pytest.raises(ValueError):
        tile_srv.render_frame(pose, focal)


def test_cli_from_checkpoint(tmp_path):
    from robust_nerf_tpu.evalx.export import main
    from robust_nerf_tpu.training.checkpoints import save_checkpoint
    from robust_nerf_tpu.training.steps import create_train_state

    cfg = NeRFConfig(
        model=SMALL,
        render=RCFG,
        data=DataConfig(batch_size=32, source="synthetic"),
        train=TrainConfig(seed=0),
        tpu=TPUConfig(steps_per_scan=1),
    )
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    ckpt_dir = tmp_path / "run"
    save_checkpoint(ckpt_dir, 0, state, config_to_dict(cfg))

    out = tmp_path / "artifact"
    main([
        "--checkpoint", str(ckpt_dir), "--out", str(out),
        "--tile", str(TILE), "--compile_cache", "off",
    ])
    srv = load_serving_artifact(out)
    rays_o, rays_d = _rays(TILE, seed=3)
    got = srv.render(rays_o, rays_d)
    want = render_rays(
        state.models, rays_o, rays_d, None, RCFG, SMALL, is_train=False
    )
    np.testing.assert_allclose(
        got["rgb_fine"], np.asarray(want["rgb_fine"]), rtol=1e-5, atol=1e-5
    )
