"""Supervisor: relaunch a training CLI after a wedge-watchdog exit.

Runs any `python -m noisy_src.train*` command line; whenever it exits with
EX_TEMPFAIL (75 — the wedge watchdog's code, training/watchdog.py) the
command is relaunched with `--resume <run_dir>` so training continues from
the latest checkpoint in a FRESH process (a wedged device tunnel cannot be
recovered in-process — round-1 incident, ROADMAP). Any other exit code
ends supervision.

    python scripts/supervise_train.py --run_dir outputs/myexp --max_retries 5 -- \
        python -m noisy_src.train --output_dir outputs --exp_name myexp \
        --wedge_timeout 600 ...
"""

from __future__ import annotations

import argparse
import subprocess
import sys

EX_TEMPFAIL = 75


def supervise(cmd, run_dir: str, max_retries: int = 5) -> int:
    attempt = 0
    current = list(cmd)
    while True:
        print(f"[supervisor] launching (attempt {attempt + 1}): "
              f"{' '.join(current)}", flush=True)
        rc = subprocess.call(current)
        if rc != EX_TEMPFAIL:
            print(f"[supervisor] exited rc={rc}; done", flush=True)
            return rc
        attempt += 1
        if attempt > max_retries:
            print(f"[supervisor] giving up after {max_retries} relaunches",
                  flush=True)
            return rc
        if "--resume" not in current:
            current = current + ["--resume", run_dir]
        print(f"[supervisor] wedge detected (rc=75); resuming from {run_dir}",
              flush=True)


def main(argv=None):
    p = argparse.ArgumentParser(allow_abbrev=False)
    p.add_argument("--run_dir", required=True,
                   help="experiment directory to --resume from on relaunch")
    p.add_argument("--max_retries", type=int, default=5)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- followed by the training command line")
    args = p.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("missing training command after --")
    sys.exit(supervise(cmd, args.run_dir, args.max_retries))


if __name__ == "__main__":
    main()
