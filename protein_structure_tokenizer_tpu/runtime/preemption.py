"""Preemption-safe training: checkpoint on SIGTERM and exit cleanly.

The reference has no training loop, let alone failure handling (SURVEY.md
§5.3 — its batch loops fail-fast).  Production TPU fleets preempt VMs with a
SIGTERM + grace window (maintenance events, spot reclaims, job rescheduling);
a run that dies between checkpoint intervals loses up to ``save_every`` steps
of work.  This module closes that gap:

    with GracefulPreemption() as pre:
        for step in ...:
            ...train...
            ckpt.save(step, ...)            # periodic
            if pre.should_stop:
                ckpt.save(step, ..., force=True)  # final, synchronous
                break

The handler only sets a flag — all checkpoint I/O happens on the main thread
at a step boundary, so the saved state is always a consistent
(params, opt_state, rng, step) tuple.  Resume is the trainers' normal
``--checkpoint_dir`` restore path.
"""
from __future__ import annotations

import logging
import signal
import threading
from types import FrameType
from typing import Optional

logger = logging.getLogger(__name__)


class GracefulPreemption:
    """Context manager that turns SIGTERM/SIGINT into a should-stop flag.

    A second signal while stopping re-raises the default behavior
    (``signal.default_int_handler`` for SIGINT), so a stuck save can still be
    interrupted by hand.
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self._signals = tuple(signals)
        self._previous: dict = {}
        self._stop = threading.Event()

    @property
    def should_stop(self) -> bool:
        return self._stop.is_set()

    def _handler(self, signum: int, frame: Optional[FrameType]) -> None:
        if self._stop.is_set():
            # Second signal: restore default behavior and re-raise.
            signal.signal(signum, self._previous.get(signum, signal.SIG_DFL))
            signal.raise_signal(signum)
            return
        logger.warning(
            "received %s: finishing the current step, checkpointing, exiting "
            "(send again to force-kill)", signal.Signals(signum).name,
        )
        self._stop.set()

    def __enter__(self) -> "GracefulPreemption":
        if threading.current_thread() is not threading.main_thread():
            # Signal handlers can only be installed from the main thread;
            # degrade to a never-set flag (e.g. tests driving the loop from a
            # worker thread).
            return self
        for sig in self._signals:
            self._previous[sig] = signal.signal(sig, self._handler)
        return self

    def __exit__(self, *exc) -> None:
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        self._previous.clear()
        return None
