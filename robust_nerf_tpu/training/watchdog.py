"""Wedge watchdog — detect a hung device dispatch and enable resume.

Motivation (round-1 incident, ROADMAP): a transient tunnel RPC loss left
the training process futex-blocked inside a device fetch at iter ~5000;
fresh processes were fine, so the correct recovery is checkpoint-resume in
a new process. A wedged PJRT call cannot be cancelled from Python, so the
watchdog's job is detection + clean handoff:

  1. `run_with_watchdog(fn, timeout_s)` runs the blocking host fetch in a
     daemon thread and raises WedgeTimeout if it does not finish in time
     (the hung thread is abandoned — by construction it never returns).
  2. The training loops catch WedgeTimeout and exit with EX_TEMPFAIL (75),
     having checkpointed every val_every/save_every iterations already.
  3. `scripts/supervise_train.py` relaunches the CLI with --resume until
     it exits cleanly — the re-dispatch happens from the last checkpoint.

The reference has no analog (its failure posture is graceful degradation
only, SURVEY.md §5.3); this is the TPU-production equivalent.
"""

from __future__ import annotations

import threading
from typing import Any, Callable

EX_TEMPFAIL = 75   # BSD sysexits: temporary failure, retry is appropriate


class WedgeTimeout(RuntimeError):
    """A device dispatch/fetch made no progress within the timeout."""


def run_with_watchdog(
    fn: Callable[[], Any], timeout_s: float, what: str = "device fetch"
) -> Any:
    """Run fn() to completion or raise WedgeTimeout after timeout_s.

    fn runs in a daemon thread; on timeout the thread is abandoned (a
    wedged device call cannot be interrupted from Python — the caller
    should checkpoint-exit and let a supervisor relaunch with --resume).
    Exceptions raised by fn propagate. timeout_s <= 0 disables the
    watchdog entirely (no extra thread).
    """
    if timeout_s <= 0:
        return fn()

    result: dict = {}
    done = threading.Event()

    def target():
        try:
            result["value"] = fn()
        except BaseException as e:  # noqa: BLE001 — propagate everything
            result["error"] = e
        finally:
            done.set()

    t = threading.Thread(target=target, daemon=True, name="wedge-watchdog")
    t.start()
    if not done.wait(timeout_s):
        raise WedgeTimeout(
            f"{what} made no progress in {timeout_s:.0f}s — likely a wedged "
            f"device tunnel; exit and resume from the latest checkpoint"
        )
    if "error" in result:
        raise result["error"]
    return result["value"]
