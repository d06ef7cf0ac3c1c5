"""Supervised training: the relaunch-on-failure loop as code, not a README
snippet (SURVEY.md §5 "failure detection / recovery").

Wraps ``python -m deepfluids_tpu.main`` and relaunches it when it dies with
the watchdog's exit code 17 (hang detector, --watchdog_secs), the fault
injector's (--die_at_step), or — with ``--restart_on any`` — any non-zero
exit (OOM kill, tunnel crash, SIGKILL).  Every relaunch passes
``--load_path <run_dir>`` so the child resumes from its latest checkpoint;
resume is EXACT (batch order is a pure function of (seed, step) —
data.dataset.step_rng), so a supervised run completes bitwise-identical to
an uninterrupted one (pinned by tests/test_supervise.py).

Usage::

    python tools/supervise.py [--max_restarts N] [--restart_on 17|any] \
        -- --dataset smoke_pos21_size5 --max_step 300000 --watchdog_secs 120 ...

Everything after ``--`` goes to deepfluids_tpu.main verbatim.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child_run_dir(child_args: list[str]) -> tuple[str, list[str]]:
    """Resolve the run dir the child will use and pin it via --load_path.

    Without the pin, a crashed child's relaunch would collide with the
    existing run dir and get a NEW timestamped one (utils.rundir), orphaning
    the checkpoint it was supposed to resume from.
    """
    sys.path.insert(0, _REPO)
    from deepfluids_tpu.config import get_config

    cfg = get_config(child_args)
    if cfg.load_path:
        return cfg.load_path, child_args
    run_dir = os.path.join(cfg.log_dir, f"{cfg.dataset}_{cfg.tag}")
    os.makedirs(run_dir, exist_ok=True)
    return run_dir, child_args + ["--load_path", run_dir]


def supervise(child_args: list[str], max_restarts: int = 10,
              restart_on: str = "17", backoff: float = 1.0) -> int:
    run_dir, child_args = _child_run_dir(child_args)
    cmd = [sys.executable, "-m", "deepfluids_tpu.main"] + child_args
    restarts = 0
    while True:
        rc = subprocess.run(cmd, cwd=_REPO).returncode
        if rc == 0:
            print(f"supervise: child completed after {restarts} restart(s)")
            return 0
        recoverable = (restart_on == "any") or rc == 17
        if not recoverable or restarts >= max_restarts:
            print(f"supervise: giving up (exit {rc}, {restarts} restarts)")
            return rc
        restarts += 1
        print(f"supervise: child exit {rc} -> relaunch #{restarts} "
              f"(resume from {run_dir})")
        time.sleep(backoff)


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if "--" in argv:
        split = argv.index("--")
        own, child = argv[:split], argv[split + 1:]
    else:
        own, child = [], argv
    p = argparse.ArgumentParser("supervise")
    p.add_argument("--max_restarts", type=int, default=10)
    p.add_argument("--restart_on", choices=("17", "any"), default="17",
                   help="17: only the watchdog/fault-injection exit code; "
                        "any: every non-zero exit")
    p.add_argument("--backoff", type=float, default=1.0)
    a = p.parse_args(own)
    return supervise(child, a.max_restarts, a.restart_on, a.backoff)


if __name__ == "__main__":
    sys.exit(main())
