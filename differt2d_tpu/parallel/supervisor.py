"""Failure detection and gang restart for multi-process runs.

SPMD jobs over ``jax.distributed`` are gang-scheduled: every collective
blocks until all processes participate, so a single dead rank wedges the
whole job rather than failing it. The production-grade remedy on TPU pods
is the one this module implements: **detect** the first rank failure,
**kill** the survivors (they cannot make progress), and **relaunch the
whole gang** — workers resume from their last checkpoint
(:mod:`differt2d_tpu.checkpoint` + ``examples/train_resumable.py`` provide
the state side of the loop).

The reference has no distributed execution and therefore no failure
handling; this subsystem exists for the new framework's multi-host mandate
(SURVEY.md §5 "failure detection", §2 parallelism inventory).

Design notes:

* The supervisor is deliberately process-based and framework-agnostic: it
  supervises any argv the caller builds, so tests can exercise restart
  semantics without paying a ``jax.distributed`` handshake per attempt.
* ``build_argv(process_id, attempt)`` receives the attempt index so the
  caller can rotate the coordinator port between attempts — required
  because a dying coordinator can leave its port in TIME_WAIT.
* A rank that exits 0 early (e.g. finished its shard) is not a failure;
  the gang succeeds when ALL ranks have exited 0.
"""

from __future__ import annotations

import os
import signal
import subprocess
import time
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

__all__ = ["GangResult", "run_gang"]


@dataclass
class GangResult:
    """Outcome of a supervised gang run."""

    succeeded: bool
    attempts: int
    returncodes: list = field(default_factory=list)
    """Per-rank exit codes of the FINAL attempt."""

    failed_ranks_per_attempt: list = field(default_factory=list)
    """For each non-final attempt, the ranks that caused the restart."""


def _terminate(procs: Sequence[subprocess.Popen], grace_s: float) -> None:
    for p in procs:
        if p.poll() is None:
            try:
                p.terminate()
            except OSError:
                pass
    deadline = time.monotonic() + grace_s
    for p in procs:
        if p.poll() is None:
            remaining = max(0.0, deadline - time.monotonic())
            try:
                p.wait(timeout=remaining)
            except subprocess.TimeoutExpired:
                try:
                    p.send_signal(signal.SIGKILL)
                    p.wait(timeout=5.0)
                except (OSError, subprocess.TimeoutExpired):
                    # A rank in uninterruptible sleep can survive even
                    # SIGKILL for a while; move on to reap the others.
                    pass


def run_gang(
    build_argv: Callable[[int, int], Sequence[str]],
    num_processes: int,
    *,
    max_restarts: int = 2,
    env: Optional[dict] = None,
    attempt_timeout_s: Optional[float] = None,
    poll_s: float = 0.2,
    grace_s: float = 10.0,
    on_restart: Optional[Callable[[int, list], None]] = None,
) -> GangResult:
    """Run ``num_processes`` ranks; on any rank failure, restart the gang.

    :param build_argv: ``(process_id, attempt) -> argv``. Rotate the
        coordinator port with ``attempt`` when the workers use
        ``jax.distributed``.
    :param max_restarts: restarts allowed AFTER the first attempt.
    :param env: environment for the workers (defaults to ``os.environ``).
    :param attempt_timeout_s: wall-clock bound per attempt; exceeding it
        counts as a failure of every still-running rank (hang detection —
        a wedged collective never exits on its own).
    :param on_restart: callback ``(next_attempt, failed_ranks)`` invoked
        before each relaunch (logging, checkpoint checks, ...).
    """
    result = GangResult(succeeded=False, attempts=0)
    worker_env = dict(os.environ if env is None else env)

    for attempt in range(max_restarts + 1):
        result.attempts = attempt + 1
        # Spawn inside the try so a failing build_argv/Popen mid-gang
        # still reaps the ranks already launched (an unsupervised rank
        # wedges forever on its first collective).
        procs: list = []
        started = time.monotonic()
        failed: list = []
        try:
            for pid in range(num_processes):
                procs.append(
                    subprocess.Popen(
                        list(build_argv(pid, attempt)), env=worker_env
                    )
                )
            while True:
                codes = [p.poll() for p in procs]
                failed = [
                    pid
                    for pid, c in enumerate(codes)
                    if c is not None and c != 0
                ]
                if failed:
                    break
                if all(c == 0 for c in codes):
                    result.succeeded = True
                    result.returncodes = codes
                    return result
                if (
                    attempt_timeout_s is not None
                    and time.monotonic() - started > attempt_timeout_s
                ):
                    failed = [
                        pid for pid, c in enumerate(codes) if c is None
                    ]
                    break
                time.sleep(poll_s)
        finally:
            # First failure wedges the gang: reap the survivors.
            if not result.succeeded:
                _terminate(procs, grace_s)

        result.returncodes = [p.poll() for p in procs]
        if attempt < max_restarts:
            result.failed_ranks_per_attempt.append(failed)
            if on_restart is not None:
                on_restart(attempt + 1, failed)

    return result
