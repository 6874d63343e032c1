"""FIFO admission controller (statement queue).

Re-expresses the reference's Enterprise admission controller
(/root/reference/src/common/include/detail/admission_controller.h,
semantics documented :71-95; acquire site duckdb_statement.cpp:
1956-2038): a strict-FIFO cap on concurrently executing statements
with a bounded wait queue and a per-acquire max wait. Spark has no
statement queue, so this is service-layer Python (Condition-based
to guarantee FIFO, which a bare Semaphore does not).
"""

from __future__ import annotations

import threading
from collections import deque
from dataclasses import dataclass


class AdmissionError(RuntimeError):
    pass


class QueueFullError(AdmissionError):
    pass


class QueueWaitTimeout(AdmissionError):
    pass


@dataclass
class AdmissionStats:
    executing: int
    queued: int
    peak_executing: int = 0
    peak_queued: int = 0
    total_admitted: int = 0
    total_rejected: int = 0
    total_timeouts: int = 0


class AdmissionController:
    """Strict-FIFO admission: up to ``max_concurrent`` statements run;
    up to ``max_queued`` wait; waiting longer than ``max_wait_seconds``
    (0 = forever) raises. ``max_concurrent`` 0 disables the gate."""

    def __init__(self, max_concurrent: int = 0, max_queued: int = 100,
                 max_wait_seconds: float = 0):
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._queue: deque[int] = deque()
        self._next_ticket = 0
        self._executing = 0
        self.max_concurrent = max_concurrent
        self.max_queued = max_queued
        self.max_wait_seconds = max_wait_seconds
        # queue-depth telemetry (statement_queuing.md: depth metrics)
        self._peak_executing = 0
        self._peak_queued = 0
        self._total_admitted = 0
        self._total_rejected = 0
        self._total_timeouts = 0

    def stats(self) -> AdmissionStats:
        with self._lock:
            return AdmissionStats(
                self._executing, len(self._queue),
                self._peak_executing, self._peak_queued,
                self._total_admitted, self._total_rejected,
                self._total_timeouts)

    def acquire(self) -> None:
        if self.max_concurrent <= 0:
            return
        with self._cv:
            if (
                self._executing >= self.max_concurrent
                and len(self._queue) >= self.max_queued
            ):
                self._total_rejected += 1
                raise QueueFullError(
                    f"admission queue full ({self.max_queued} waiting)"
                )
            ticket = self._next_ticket
            self._next_ticket += 1
            self._queue.append(ticket)
            self._peak_queued = max(self._peak_queued, len(self._queue))
            deadline = (
                None
                if self.max_wait_seconds <= 0
                else threading.TIMEOUT_MAX
                if self.max_wait_seconds is None
                else self.max_wait_seconds
            )
            waited = 0.0
            while not (
                self._queue and self._queue[0] == ticket
                and self._executing < self.max_concurrent
            ):
                timeout = None if deadline is None else deadline - waited
                if timeout is not None and timeout <= 0:
                    self._queue.remove(ticket)
                    self._total_timeouts += 1
                    self._cv.notify_all()
                    raise QueueWaitTimeout(
                        f"waited > {self.max_wait_seconds}s for admission"
                    )
                import time as _time

                t0 = _time.monotonic()
                self._cv.wait(timeout)
                waited += _time.monotonic() - t0
            self._queue.popleft()
            self._executing += 1
            self._peak_executing = max(self._peak_executing, self._executing)
            self._total_admitted += 1
            self._cv.notify_all()

    def release(self) -> None:
        if self.max_concurrent <= 0:
            return
        with self._cv:
            self._executing = max(0, self._executing - 1)
            self._cv.notify_all()
