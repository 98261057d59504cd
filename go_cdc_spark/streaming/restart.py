"""Configurable restart policy for streaming queries.

The reference wraps its binlog loop in a reconnect policy
(`internal/cannal/incremental.go:100-114`): exponential backoff starting
at 1s, doubling to a 30s cap, giving up after 10 *consecutive* failures
(a successful run resets the counter). Structured Streaming's checkpoint
makes the restart itself safe (no double-apply); this module adds the
missing policy knob around it.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable


@dataclass
class RestartPolicy:
    """`incremental.go:100-114` parity: 1s ×2 → 30s cap, ≤10 fails."""

    max_attempts: int = 10
    base_delay: float = 1.0
    factor: float = 2.0
    cap: float = 30.0

    def delays(self):
        """The backoff sequence (unbounded; caller zips with attempts)."""
        d = self.base_delay
        while True:
            yield d
            d = min(d * self.factor, self.cap)


class RetriesExhausted(RuntimeError):
    def __init__(self, attempts: int, last: Exception):
        super().__init__(f"streaming query failed {attempts} consecutive times: {last}")
        self.attempts = attempts
        self.last = last


def run_with_restart(
    start_query: Callable[[], "StreamingQuery"],  # noqa: F821 — forward ref
    policy: RestartPolicy | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> None:
    """Start → awaitTermination → on failure, back off and restart from
    the checkpoint; raise :class:`RetriesExhausted` after
    ``policy.max_attempts`` consecutive failures. A run that terminates
    cleanly (availableNow drained, or ``stop()``) returns. The counter
    only ever counts CONSECUTIVE failures (the reference resets it on
    progress, `incremental.go:171-173`); a clean termination ends the
    loop here, so there is nothing to reset across."""
    policy = policy or RestartPolicy()
    failures = 0
    backoff = policy.delays()
    while True:
        try:
            q = start_query()
            q.awaitTermination()
            return
        except Exception as exc:  # StreamingQueryException et al.
            failures += 1
            if failures >= policy.max_attempts:
                raise RetriesExhausted(failures, exc) from exc
            sleep(next(backoff))
