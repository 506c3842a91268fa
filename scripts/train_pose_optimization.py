"""Canned pose-optimization experiments.

Behavioral parity with the reference script
(scripts/train_pose_optimization.py:26-356): six standard experiments over
init mode x noise level, runnable by number. Defaults target the real
Blender lego scene; pass --data_source synthetic to run dataset-free.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from robust_nerf_tpu.config import (  # noqa: E402
    DataConfig,
    NeRFConfig,
    PoseOptConfig,
    TrainConfig,
)
from robust_nerf_tpu.core.noise import NoiseConfig  # noqa: E402
from robust_nerf_tpu.training.train_pose_opt import (  # noqa: E402
    train_with_pose_optimization,
)


def _base_config(args, num_iters: int) -> NeRFConfig:
    return NeRFConfig(
        data=DataConfig(
            scene_name=args.scene,
            data_root=args.data_root,
            batch_size=args.batch_size,
            source=args.data_source,
        ),
        train=TrainConfig(
            num_iterations=num_iters,
            val_every=args.val_every,
            output_dir=args.output_dir,
        ),
    )


# Experiment registry (reference: :26-315). (name, description, builder)
def exp_1_clean_init(args):
    """Clean initialization — verify the system maintains performance."""
    cfg = _base_config(args, args.num_iters)
    cfg.pose_opt = PoseOptConfig(init_mode="clean", pose_opt_delay=1000)
    return cfg, None


def exp_2_rotation_only(args):
    """Rotation noise only: 2 degrees."""
    cfg = _base_config(args, args.num_iters)
    cfg.pose_opt = PoseOptConfig(init_mode="noisy", rotation_noise_deg=2.0,
                                 noise_seed=42)
    return cfg, NoiseConfig(rotation_noise_deg=2.0, seed=42)


def exp_3_translation_only(args):
    """Translation noise only: 1% of camera distance."""
    cfg = _base_config(args, args.num_iters)
    cfg.pose_opt = PoseOptConfig(init_mode="noisy", translation_noise_pct=1.0,
                                 noise_seed=42)
    return cfg, NoiseConfig(translation_noise_pct=1.0, seed=42)


def exp_4_joint_noise(args):
    """Joint noise: 2 degrees rotation + 1% translation."""
    cfg = _base_config(args, args.num_iters)
    cfg.pose_opt = PoseOptConfig(init_mode="noisy", rotation_noise_deg=2.0,
                                 translation_noise_pct=1.0, noise_seed=42)
    return cfg, NoiseConfig(rotation_noise_deg=2.0, translation_noise_pct=1.0,
                            seed=42)


def exp_5_severe_noise(args):
    """Severe noise: 5 degrees + 2%, the seed-validated severe-recovery
    recipe (training/train_pose_opt.py SEVERE_RECOVERY_PRESET)."""
    from robust_nerf_tpu.training.train_pose_opt import SEVERE_RECOVERY_PRESET

    cfg = _base_config(args, args.num_iters)
    cfg.pose_opt = PoseOptConfig(init_mode="noisy", rotation_noise_deg=5.0,
                                 translation_noise_pct=2.0, noise_seed=42,
                                 **SEVERE_RECOVERY_PRESET)
    return cfg, NoiseConfig(rotation_noise_deg=5.0, translation_noise_pct=2.0,
                            seed=42)


def exp_6_delayed_opt(args):
    """Delayed optimization: NeRF warms up 10k iters before poses move."""
    cfg = _base_config(args, args.num_iters)
    cfg.pose_opt = PoseOptConfig(init_mode="noisy", rotation_noise_deg=2.0,
                                 translation_noise_pct=1.0,
                                 pose_opt_delay=10000, noise_seed=42)
    return cfg, NoiseConfig(rotation_noise_deg=2.0, translation_noise_pct=1.0,
                            seed=42)


EXPERIMENTS = {
    1: exp_1_clean_init,
    2: exp_2_rotation_only,
    3: exp_3_translation_only,
    4: exp_4_joint_noise,
    5: exp_5_severe_noise,
    6: exp_6_delayed_opt,
}


def main(argv=None):
    parser = argparse.ArgumentParser(
        allow_abbrev=False, description="Canned pose-opt experiments")
    parser.add_argument("--example", type=int, required=True,
                        choices=sorted(EXPERIMENTS))
    parser.add_argument("--scene", default="lego")
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--data_source", default="blender",
                        choices=["blender", "synthetic"])
    parser.add_argument("--num_iters", type=int, default=50000)
    parser.add_argument("--val_every", type=int, default=2500)
    parser.add_argument("--batch_size", type=int, default=1024)
    parser.add_argument("--output_dir", default="outputs")
    args = parser.parse_args(argv)

    builder = EXPERIMENTS[args.example]
    print(f"Experiment {args.example}: {builder.__doc__.strip()}")
    cfg, noise = builder(args)
    train_with_pose_optimization(cfg, noise)


if __name__ == "__main__":
    main()
