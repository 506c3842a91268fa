"""Wedge-watchdog tests — stubbed hang detection + supervisor relaunch
(round-1 tunnel-wedge incident; training/watchdog.py)."""

import sys
import threading
import time

import pytest

from robust_nerf_tpu.training.watchdog import (
    EX_TEMPFAIL,
    WedgeTimeout,
    run_with_watchdog,
)


class TestRunWithWatchdog:
    def test_fast_fn_returns_value(self):
        assert run_with_watchdog(lambda: 42, timeout_s=5.0) == 42

    def test_stubbed_hang_raises(self):
        hang = threading.Event()   # never set — a true wedge

        def wedged():
            hang.wait(30.0)
            return "unreachable"

        t0 = time.time()
        with pytest.raises(WedgeTimeout, match="no progress"):
            run_with_watchdog(wedged, timeout_s=0.2, what="stub fetch")
        assert time.time() - t0 < 5.0   # detected promptly, not after 30 s

    def test_exceptions_propagate(self):
        def boom():
            raise ValueError("inner failure")

        with pytest.raises(ValueError, match="inner failure"):
            run_with_watchdog(boom, timeout_s=5.0)

    def test_disabled_runs_inline(self):
        """timeout <= 0 must not spawn a thread (no daemon leak per chunk)."""
        main_thread = threading.current_thread()
        seen = {}

        def probe():
            seen["thread"] = threading.current_thread()
            return 7

        assert run_with_watchdog(probe, timeout_s=0.0) == 7
        assert seen["thread"] is main_thread


class TestSupervisor:
    def test_relaunches_on_tempfail_with_resume(self, tmp_path):
        """Supervisor relaunches rc=75 with --resume, stops on rc=0."""
        sys.path.insert(0, "scripts")
        from supervise_train import supervise

        marker = tmp_path / "attempts"
        script = tmp_path / "fake_train.py"
        script.write_text(
            "import sys, pathlib\n"
            f"m = pathlib.Path({str(marker)!r})\n"
            "n = int(m.read_text()) if m.exists() else 0\n"
            "m.write_text(str(n + 1))\n"
            "resumed = '--resume' in sys.argv\n"
            "sys.exit(0 if (n >= 2 and resumed) else 75)\n"
        )
        rc = supervise(
            [sys.executable, str(script)], run_dir=str(tmp_path),
            max_retries=5,
        )
        assert rc == 0
        assert int(marker.read_text()) == 3   # 1 initial + 2 relaunches

    def test_gives_up_after_max_retries(self, tmp_path):
        sys.path.insert(0, "scripts")
        from supervise_train import supervise

        script = tmp_path / "always_wedge.py"
        script.write_text("import sys; sys.exit(75)\n")
        rc = supervise(
            [sys.executable, str(script)], run_dir=str(tmp_path),
            max_retries=2,
        )
        assert rc == EX_TEMPFAIL

    def test_relaunches_on_crash_signal(self, tmp_path):
        """A SIGABRT death (tunnel C++ runtime abort, round-3 200k-run
        incident) is resumed just like a wedge; clean rc=0 then stops."""
        sys.path.insert(0, "scripts")
        from supervise_train import supervise

        marker = tmp_path / "attempts"
        script = tmp_path / "abort_once.py"
        script.write_text(
            "import os, signal, sys, pathlib\n"
            f"m = pathlib.Path({str(marker)!r})\n"
            "n = int(m.read_text()) if m.exists() else 0\n"
            "m.write_text(str(n + 1))\n"
            "if n == 0:\n"
            "    os.kill(os.getpid(), signal.SIGABRT)\n"
            "sys.exit(0 if '--resume' in sys.argv else 1)\n"
        )
        rc = supervise(
            [sys.executable, str(script)], run_dir=str(tmp_path),
            max_retries=3,
        )
        assert rc == 0
        assert int(marker.read_text()) == 2   # 1 crash + 1 resumed success

    def test_no_relaunch_on_operator_kill_or_error(self, tmp_path):
        """SIGTERM/SIGINT deaths and plain Python errors end supervision."""
        sys.path.insert(0, "scripts")
        from supervise_train import should_relaunch, supervise

        assert not should_relaunch(0)
        assert not should_relaunch(1)        # ordinary Python error
        assert not should_relaunch(-15)      # SIGTERM (operator kill)
        assert not should_relaunch(-2)       # SIGINT
        assert not should_relaunch(-9)       # SIGKILL
        assert should_relaunch(-6)           # SIGABRT
        assert should_relaunch(134)          # shell-style 128+SIGABRT
        assert should_relaunch(-11)          # SIGSEGV
        assert should_relaunch(75)           # wedge watchdog

        script = tmp_path / "dies_term.py"
        script.write_text(
            "import os, signal; os.kill(os.getpid(), signal.SIGTERM)\n"
        )
        rc = supervise(
            [sys.executable, str(script)], run_dir=str(tmp_path),
            max_retries=3,
        )
        assert rc == -15
