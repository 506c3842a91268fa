"""Supervisor: relaunch a training CLI after a wedge or runtime crash.

Runs any `python -m noisy_src.train*` command line; whenever it exits with
EX_TEMPFAIL (75 — the wedge watchdog's code, training/watchdog.py) OR dies
on a crash signal (SIGABRT/SIGSEGV/SIGBUS/SIGFPE/SIGILL — e.g. the device
tunnel's C++ runtime aborting mid-run, observed as `terminate called ...`
rc=-6 during the round-3 200k run) the command is relaunched with
`--resume <run_dir>` so training continues from the latest checkpoint in a
FRESH process (a wedged or crashed device tunnel cannot be recovered
in-process — round-1 incident, ROADMAP). Clean exits, ordinary Python
errors, and operator kills (SIGINT/SIGTERM/SIGKILL) end supervision.

    python scripts/supervise_train.py --run_dir outputs/myexp --max_retries 5 -- \
        python -m noisy_src.train --output_dir outputs --exp_name myexp \
        --wedge_timeout 600 ...
"""

from __future__ import annotations

import argparse
import signal
import subprocess
import sys

EX_TEMPFAIL = 75

# Crash signals that indicate the process died out from under the training
# loop (runtime abort, memory fault) rather than a deliberate stop. Both
# subprocess conventions are recognized: negative (Popen) and 128+N (shell).
CRASH_SIGNALS = {
    signal.SIGABRT,
    signal.SIGSEGV,
    signal.SIGBUS,
    signal.SIGFPE,
    signal.SIGILL,
}


def should_relaunch(rc: int) -> bool:
    if rc == EX_TEMPFAIL:
        return True
    crash_nums = {int(s) for s in CRASH_SIGNALS}
    if rc < 0:
        return -rc in crash_nums
    return rc > 128 and (rc - 128) in crash_nums


def supervise(cmd, run_dir: str, max_retries: int = 5) -> int:
    attempt = 0
    current = list(cmd)
    while True:
        print(f"[supervisor] launching (attempt {attempt + 1}): "
              f"{' '.join(current)}", flush=True)
        rc = subprocess.call(current)
        if not should_relaunch(rc):
            print(f"[supervisor] exited rc={rc}; done", flush=True)
            return rc
        attempt += 1
        if attempt > max_retries:
            print(f"[supervisor] giving up after {max_retries} relaunches",
                  flush=True)
            return rc
        if "--resume" not in current:
            current = current + ["--resume", run_dir]
        reason = "wedge (rc=75)" if rc == EX_TEMPFAIL else f"crash (rc={rc})"
        print(f"[supervisor] {reason}; resuming from {run_dir}", flush=True)


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
