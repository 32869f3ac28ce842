"""Preemption-safe training: checkpoint on SIGTERM, exit clean, resume.

The reference has no preemption handling (SURVEY.md §5: sim errors and
update exceptions are caught locally, nothing else). On TPU pods,
preemption is routine — maintenance events and spot reclamation deliver
SIGTERM with a grace window — so the TPU-native equivalent of elastic
recovery is: notice the signal, write one final checkpoint through the
normal rotation/retention path, and exit so the scheduler can restart the
job, which auto-resumes from ``latest`` (``diffusion/driver.py`` /
``control/trainer.py`` resume contracts).

``PreemptionGuard`` is cooperative: the signal handler only sets a flag
(async-signal-safe); the training loop polls ``requested`` at step/epoch
boundaries and shuts down through its ordinary checkpoint code. Chains any
previously-installed handler so test harnesses and outer supervisors still
see the signal.
"""

from __future__ import annotations

import signal
import threading


class PreemptionGuard:
    """Flag-setting SIGTERM/SIGUSR1 watcher for cooperative shutdown.

    Usage::

        guard = PreemptionGuard.install()
        while training:
            step()
            if guard.requested:
                save_checkpoint()
                break

    Only the main thread of the main interpreter can install signal
    handlers; calling ``install`` elsewhere returns a guard that never
    fires (headless safety in tests/workers).
    """

    def __init__(self) -> None:
        self._event = threading.Event()
        self._prev: dict[int, object] = {}

    @property
    def requested(self) -> bool:
        return self._event.is_set()

    def request(self) -> None:
        """Mark preemption as requested (the signal handler body; public
        so supervisors/tests can trigger the same path in-process)."""
        self._event.set()

    @classmethod
    def install(cls, signals=(signal.SIGTERM,)) -> "PreemptionGuard":
        guard = cls()
        if threading.current_thread() is not threading.main_thread():
            return guard  # can't install handlers off the main thread

        for sig in signals:
            prev = signal.getsignal(sig)
            guard._prev[sig] = prev

            def handler(signum, frame, _prev=prev):
                guard.request()
                if callable(_prev):
                    _prev(signum, frame)

            signal.signal(sig, handler)
        return guard

    def uninstall(self) -> None:
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev.clear()
