"""Sink retry with capped full-jitter backoff.

The reference retries failed output flushes with "full jitter"
exponential backoff, base 5 s capped at 2000 s, per-output retry
limits (src/flb_scheduler.c:255-301, include/fluent-bit/
flb_scheduler.h:30-31, flb_task.c:115-139). Spark's task scheduler
retries *tasks*; this wrapper covers the remaining surface — sink-level
delivery retries around a whole write — with deterministic (seeded)
jitter so tests and replays are reproducible. Writes must be
idempotent (overwrite paths), which checkpoint.py already requires.
"""

from __future__ import annotations

import logging
import random
import time
from collections.abc import Callable

log = logging.getLogger(__name__)


class RetryError(RuntimeError):
    def __init__(self, attempts: int, last: Exception):
        super().__init__(f"sink failed after {attempts} attempts: {last}")
        self.attempts = attempts
        self.last = last


def full_jitter_delays(
    retries: int, base: float = 5.0, cap: float = 2000.0, seed: int = 42
) -> list[float]:
    """Delay schedule: uniform(0, min(cap, base * 2^n)) per attempt —
    the reference's full-jitter formula, deterministic via seed."""
    rng = random.Random(seed)
    return [rng.uniform(0, min(cap, base * (2**n))) for n in range(retries)]


def retry_write(
    fn: Callable[[], None],
    retries: int = 3,
    base: float = 5.0,
    cap: float = 2000.0,
    seed: int = 42,
    sleep: Callable[[float], None] = time.sleep,
) -> int:
    """Run an idempotent write, retrying with capped full-jitter
    backoff. Returns the number of attempts used; raises RetryError
    when the limit (≙ Retry_Limit) is exhausted."""
    delays = full_jitter_delays(retries, base, cap, seed)
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            fn()
            return attempt + 1
        except Exception as e:  # noqa: BLE001 - sink errors are opaque
            last = e
            if attempt < retries:
                d = delays[attempt]
                log.warning("sink write failed (attempt %d): %s; backoff %.2fs", attempt + 1, e, d)
                sleep(d)
    raise RetryError(retries + 1, last)


def retry_schedule_frame(
    failed,
    key_cols: tuple = ("conv_id", "turn_idx"),
    base_s: int = 2,
    cap_s: int = 30,
    max_retries: int = 5,
    ts_col: str = "ts",
):
    """The retry *plan* as a DataFrame: for every failed record, the
    deterministic capped-exponential schedule (no jitter — this is the
    queryable upper-envelope of the reference's full-jitter draw, whose
    per-attempt ceiling is exactly min(cap, base*2^(n-1));
    src/flb_scheduler.c:255-301). Emits one row per (record, attempt)
    with the per-attempt delay and the absolute retry time from the
    cumulative delay — the table a delivery dashboard joins against
    "has it been delivered yet".

    Scale shape: explode to max_retries rows per failed record (a
    bounded fan-out over the small failed set), one record-partitioned
    cumsum window bounded by max_retries rows.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    staged = failed.withColumn(
        "attempt", F.explode(F.sequence(F.lit(1), F.lit(max_retries)))
    ).withColumn(
        "delay_s",
        F.least(
            F.lit(cap_s).cast("long"),
            F.lit(base_s) * F.pow(F.lit(2.0), F.col("attempt") - 1).cast("long"),
        ),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("attempt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return staged.withColumn(
        "retry_at",
        F.timestamp_add("SECOND", F.sum("delay_s").over(w), F.col(ts_col)),
    )
