"""Post-hoc visualization CLI — plots from experiment CSV/JSON artifacts.

Behavioral parity with `python -m noisy_src.visualize` (reference:
noisy_src/visualize.py:43-474): training-curve 2x2 grids, validation
curves, multi-experiment comparison overlays, summary tables, final-result
bar charts. Reads the same logs/{train,val}_metrics.csv + summary.json
layout this framework writes. matplotlib/pandas are lazily imported and
absence degrades to a clear error (reference guard: visualize.py:20-40).

Additions over the reference: pose-error curves (logs/pose_errors.csv)
for pose-opt runs.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import List, Optional


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError as e:
        raise SystemExit(f"matplotlib required for visualization: {e}")


def _pd():
    try:
        import pandas as pd

        return pd
    except ImportError as e:
        raise SystemExit(f"pandas required for visualization: {e}")


def check_dependencies() -> None:
    """Raise if matplotlib/pandas are unavailable
    (reference: visualize.py:35-40)."""
    _plt()
    _pd()


def load_training_logs(exp_dir: Path):
    """logs/train_metrics.csv as a DataFrame (reference: visualize.py:43-49)."""
    pd = _pd()
    csv_path = Path(exp_dir) / "logs" / "train_metrics.csv"
    if not csv_path.exists():
        raise FileNotFoundError(f"Training log not found: {csv_path}")
    return pd.read_csv(csv_path)


def load_validation_logs(exp_dir: Path):
    """logs/val_metrics.csv as a DataFrame (reference: visualize.py:52-58)."""
    pd = _pd()
    csv_path = Path(exp_dir) / "logs" / "val_metrics.csv"
    if not csv_path.exists():
        raise FileNotFoundError(f"Validation log not found: {csv_path}")
    return pd.read_csv(csv_path)


def load_summary(exp_dir: Path) -> dict:
    """summary.json as a dict (reference: visualize.py:61-67)."""
    summary_path = Path(exp_dir) / "summary.json"
    if not summary_path.exists():
        raise FileNotFoundError(f"Summary not found: {summary_path}")
    with open(summary_path) as f:
        return json.load(f)


def create_report_figures(
    exp_dir: Path, output_dir: Optional[Path] = None
) -> Path:
    """Write training_curves.png + validation_curves.png (+ pose_errors.png
    for pose-opt runs) into `<exp_dir>/figures/`
    (reference: visualize.py:387-429)."""
    exp_dir = Path(exp_dir)
    output_dir = Path(output_dir) if output_dir else exp_dir / "figures"
    output_dir.mkdir(parents=True, exist_ok=True)
    for name, fn, optional in [
        ("training_curves.png", plot_training_curves, False),
        ("validation_curves.png", plot_validation_curves, False),
        # standard runs have no pose_errors.csv — absence is expected
        ("pose_errors.png", plot_pose_errors, True),
    ]:
        try:
            fn(exp_dir, output=output_dir / name)
        except FileNotFoundError as e:
            if not optional:  # reference warns and continues (:410-428)
                print(f"  Warning: could not generate {name}: {e}")
        except Exception as e:
            print(f"  Warning: could not generate {name}: {e}")
    return output_dir


def create_comparison_plot(
    experiments: List[Path],
    metric: str = "psnr",
    output_path: Optional[Path] = None,
) -> Optional[Path]:
    """Overlay `metric` across experiments — loss reads the train CSV,
    val metrics read the val CSV (reference: logger.py:371-423)."""
    plt, pd = _plt(), _pd()
    fig, ax = plt.subplots(figsize=(10, 6))
    for exp_path in experiments:
        exp_path = Path(exp_path)
        csv_file = (
            exp_path / "logs" / "train_metrics.csv"
            if metric == "loss"
            else exp_path / "logs" / "val_metrics.csv"
        )
        if not csv_file.exists():
            print(f"Warning: {csv_file} not found")
            continue
        df = pd.read_csv(csv_file)
        if metric in df.columns:
            ax.plot(df["iteration"], df[metric], label=exp_path.name)
    ax.set_xlabel("Iteration")
    ax.set_ylabel(metric.upper())
    ax.set_title(f"Training Comparison: {metric.upper()}")
    ax.legend()
    ax.grid(True, alpha=0.3)
    if output_path:
        fig.savefig(output_path, dpi=150, bbox_inches="tight")
        print(f"Plot saved to {output_path}")
    plt.close(fig)
    return Path(output_path) if output_path else None


def plot_training_curves(exp_dir: Path, output: Optional[Path] = None) -> Path:
    """2x2 grid: loss / train PSNR / lr / rays-per-sec
    (reference: visualize.py:70-143)."""
    plt, pd = _plt(), _pd()
    df = pd.read_csv(Path(exp_dir) / "logs" / "train_metrics.csv")

    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    axes[0, 0].plot(df["iteration"], df["loss"], label="total", lw=0.8)
    if "loss_coarse" in df:
        axes[0, 0].plot(df["iteration"], df["loss_coarse"], label="coarse", lw=0.8)
    if "loss_fine" in df and df["loss_fine"].notna().any():
        axes[0, 0].plot(df["iteration"], df["loss_fine"], label="fine", lw=0.8)
    axes[0, 0].set_yscale("log")
    axes[0, 0].set_title("Training loss")
    axes[0, 0].legend()

    axes[0, 1].plot(df["iteration"], df["psnr"], lw=0.8)
    axes[0, 1].set_title("Training PSNR (dB)")

    axes[1, 0].plot(df["iteration"], df["learning_rate"], lw=0.8)
    axes[1, 0].set_title("Learning rate")

    axes[1, 1].plot(df["iteration"], df["rays_per_sec"], lw=0.8)
    axes[1, 1].set_title("Rays / sec")

    for ax in axes.flat:
        ax.set_xlabel("iteration")
        ax.grid(alpha=0.3)
    fig.suptitle(Path(exp_dir).name)
    fig.tight_layout()
    out = output or Path(exp_dir) / "training_curves.png"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_validation_curves(exp_dir: Path, output: Optional[Path] = None) -> Path:
    """Validation PSNR/SSIM/MSE over iterations
    (reference: visualize.py:146-211)."""
    plt, pd = _plt(), _pd()
    df = pd.read_csv(Path(exp_dir) / "logs" / "val_metrics.csv")

    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    axes[0].plot(df["iteration"], df["psnr"], marker="o")
    axes[0].set_title("Val PSNR (dB)")
    axes[1].plot(df["iteration"], df["ssim"], marker="o")
    axes[1].set_title("Val SSIM")
    axes[2].plot(df["iteration"], df["mse"], marker="o")
    axes[2].set_title("Val MSE")
    axes[2].set_yscale("log")
    for ax in axes:
        ax.set_xlabel("iteration")
        ax.grid(alpha=0.3)
    fig.suptitle(Path(exp_dir).name)
    fig.tight_layout()
    out = output or Path(exp_dir) / "validation_curves.png"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_pose_errors(exp_dir: Path, output: Optional[Path] = None) -> Path:
    """Pose rotation/translation error trajectories (pose-opt runs)."""
    plt, pd = _plt(), _pd()
    df = pd.read_csv(Path(exp_dir) / "logs" / "pose_errors.csv")

    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].plot(df["iteration"], df["mean_rotation_error_deg"], marker="o",
                 label="mean")
    axes[0].plot(df["iteration"], df["max_rotation_error_deg"], marker=".",
                 ls="--", label="max")
    axes[0].set_title("Rotation error (deg)")
    axes[0].legend()
    axes[1].plot(df["iteration"], df["mean_translation_error"], marker="o",
                 label="mean")
    axes[1].plot(df["iteration"], df["max_translation_error"], marker=".",
                 ls="--", label="max")
    axes[1].set_title("Translation error")
    axes[1].legend()
    for ax in axes:
        ax.set_xlabel("iteration")
        ax.grid(alpha=0.3)
    fig.suptitle(Path(exp_dir).name)
    fig.tight_layout()
    out = output or Path(exp_dir) / "pose_errors.png"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def compare_experiments(
    exp_dirs: List[Path], output: Path, metric: str = "psnr"
) -> Path:
    """Overlay validation curves of multiple runs
    (reference: visualize.py:214-284)."""
    plt, pd = _plt(), _pd()
    fig, ax = plt.subplots(figsize=(8, 5))
    for d in exp_dirs:
        d = Path(d)
        try:
            df = pd.read_csv(d / "logs" / "val_metrics.csv")
        except FileNotFoundError:
            print(f"skipping {d}: no val_metrics.csv")
            continue
        ax.plot(df["iteration"], df[metric], marker="o", label=d.name)
    ax.set_xlabel("iteration")
    ax.set_ylabel(metric)
    ax.grid(alpha=0.3)
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(output, dpi=120)
    plt.close(fig)
    return Path(output)


def create_summary_table(exp_dirs: List[Path], output: Optional[Path] = None):
    """Aggregate summary.json files into a CSV table
    (reference: visualize.py:287-323)."""
    pd = _pd()
    rows = []
    for d in exp_dirs:
        d = Path(d)
        try:
            with open(d / "summary.json") as f:
                s = json.load(f)
        except FileNotFoundError:
            continue
        rows.append(
            {
                "experiment": d.name,
                "final_psnr": s.get("final_val_psnr"),
                "best_psnr": s.get("best_val_psnr"),
                "final_ssim": s.get("final_val_ssim"),
                "iterations": s.get("total_iterations"),
                "wall_time_s": s.get("total_time_seconds"),
            }
        )
    df = pd.DataFrame(rows)
    if output:
        df.to_csv(output, index=False)
    return df


def plot_final_results(exp_dirs: List[Path], output: Path) -> Path:
    """Bar chart of final PSNR/SSIM per experiment
    (reference: visualize.py:326-384)."""
    plt = _plt()
    df = create_summary_table(exp_dirs)
    if df.empty:
        raise SystemExit("no summary.json found in the given experiment dirs")
    fig, axes = plt.subplots(1, 2, figsize=(max(8, 2 * len(df)), 5))
    axes[0].bar(df["experiment"], df["final_psnr"])
    axes[0].set_title("Final val PSNR (dB)")
    axes[1].bar(df["experiment"], df["final_ssim"])
    axes[1].set_title("Final val SSIM")
    for ax in axes:
        ax.tick_params(axis="x", rotation=75, labelsize=7)
        ax.grid(alpha=0.3, axis="y")
    fig.tight_layout()
    fig.savefig(output, dpi=120)
    plt.close(fig)
    return Path(output)


def main(argv=None):
    parser = argparse.ArgumentParser(
        allow_abbrev=False, description="Experiment visualization")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("training", help="plot training curves for one run")
    p.add_argument("exp_dir", type=Path)
    p.add_argument("--output", type=Path, default=None)

    p = sub.add_parser("validation", help="plot validation curves for one run")
    p.add_argument("exp_dir", type=Path)
    p.add_argument("--output", type=Path, default=None)

    p = sub.add_parser("pose", help="plot pose-error trajectories")
    p.add_argument("exp_dir", type=Path)
    p.add_argument("--output", type=Path, default=None)

    p = sub.add_parser("compare", help="overlay validation curves of runs")
    p.add_argument("exp_dirs", type=Path, nargs="+")
    p.add_argument("--output", type=Path, required=True)
    p.add_argument("--metric", default="psnr")

    p = sub.add_parser("table", help="summary table across runs")
    p.add_argument("exp_dirs", type=Path, nargs="+")
    p.add_argument("--output", type=Path, default=None)

    p = sub.add_parser("final", help="bar charts of final metrics")
    p.add_argument("exp_dirs", type=Path, nargs="+")
    p.add_argument("--output", type=Path, required=True)

    args = parser.parse_args(argv)
    if args.command == "training":
        print(plot_training_curves(args.exp_dir, args.output))
    elif args.command == "validation":
        print(plot_validation_curves(args.exp_dir, args.output))
    elif args.command == "pose":
        print(plot_pose_errors(args.exp_dir, args.output))
    elif args.command == "compare":
        print(compare_experiments(args.exp_dirs, args.output, args.metric))
    elif args.command == "table":
        df = create_summary_table(args.exp_dirs, args.output)
        print(df.to_string(index=False))
    elif args.command == "final":
        print(plot_final_results(args.exp_dirs, args.output))


if __name__ == "__main__":
    main()
