"""Custom stateful streaming operator: event sessionization.

The reference has no streaming state machine (its only incremental
source, OAI-PMH, is batch-replayed — SURVEY.md §2.E), but a large-scale
ingest pipeline needs one; this implements gap-based sessionization with
``applyInPandasWithState``: per-key (user) state carries the open
session; a session closes when a new event arrives more than ``gap``
after the last one, or when the state times out (processing-time) with
no new events.

Emitted rows: one per CLOSED session —
``(user_id, session_start, session_end, n_events, total_value)``.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# open-session state: (start_us, end_us, n_events, total scaled to 1e-6)
# — the total is an exact integer in micro-units so the accumulation is
# order-independent and bit-equal to the batch twin's decimal(28,6) sum.
# NOTE: this is a STATE SCHEMA CHANGE vs the pre-round-3 double field —
# resume a pre-change streaming checkpoint by draining it with the old
# code, then restarting on a fresh checkpoint (Spark state schemas don't
# evolve in place)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total_scaled", T.LongType()),
    ]
)

_US = 1_000_000


def _scale6(v: float) -> int:
    """round-half-up(v · 10⁶) on the double's exact binary value — the
    same rounding Spark's double→decimal(28,6) cast performs, so the
    streaming accumulator and the batch decimal sum agree exactly."""
    import decimal

    return int(
        decimal.Decimal(v).scaleb(6).quantize(decimal.Decimal(1), decimal.ROUND_HALF_UP)
    )


def _session_fn(gap_seconds: float, timeout_ms: int):
    gap_us = int(gap_seconds * _US)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        closed: list[tuple] = []

        def emit(start_us: int, end_us: int, n: int, total_scaled: int):
            closed.append(
                (
                    user_id,
                    dt.datetime.utcfromtimestamp(start_us / _US),
                    dt.datetime.utcfromtimestamp(end_us / _US),
                    n,
                    total_scaled / 1e6,
                )
            )

        if state.hasTimedOut:
            if state.exists:
                s, e, n, tot = state.get
                emit(s, e, n, tot)
            state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
            ts_us = rows["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            vals = rows["value"].to_numpy()
            if state.exists:
                s, e, n, tot = state.get
            else:
                s = e = int(ts_us[0])
                n, tot = 0, 0
            for t_us, v in zip(ts_us, vals):
                t_us = int(t_us)
                if n > 0 and t_us - e > gap_us:
                    emit(s, e, n, tot)
                    s, n, tot = t_us, 0, 0
                if n == 0:
                    s = t_us
                e = t_us
                n += 1
                tot += _scale6(float(v))
            state.update((int(s), int(e), int(n), int(tot)))
            if timeout_ms:
                state.setTimeoutDuration(timeout_ms)
        out = pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
        )
        if out.empty:  # keep Arrow dtypes stable for empty frames
            out = out.astype(
                {
                    "user_id": "int64",
                    "session_start": "datetime64[us]",
                    "session_end": "datetime64[us]",
                    "n_events": "int64",
                    "total_value": "float64",
                }
            )
        yield out

    return fn


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    timeout_ms: int = 0,
) -> DataFrame:
    """Streaming gap sessionization over (user_id, ts, value) events.

    State is bounded: one open session per user.  ``timeout_ms > 0``
    additionally flushes sessions of users that went quiet via a
    processing-time timeout (continuous deployments); leave 0 for
    ``availableNow`` replays, where timeouts would re-trigger empty
    batches.  At 100 TB/day the groupBy key (user) shards state uniformly
    across executors — the standard scalable shape for custom streaming
    state.
    """
    n = {"minutes": 60, "minute": 60, "seconds": 1, "second": 1, "hours": 3600, "hour": 3600}
    qty, unit = gap.split()
    gap_seconds = float(qty) * n[unit]
    return (
        events.selectExpr("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds, timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def sessionize_batch(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Batch twin of :func:`sessionize` — identical gap semantics as one
    Catalyst window pipeline (lag → session-break flag → running sum →
    per-session aggregate).  Emits EVERY session (a finite input closes
    them all); the streaming operator's closed sessions are a prefix of
    this output, which the equivalence pytest asserts.  Fully
    SQL-expressible, so this is the oracle-gated face of the
    sessionization semantics."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(user_col).orderBy(ts_col)
    # NTZ timestamps can't cast straight to double under ANSI; go through
    # epoch micros (session tz is pinned UTC in get_spark)
    ts_s = (
        F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double")
        / F.lit(1_000_000.0)
    )
    prev = F.lag(ts_s).over(w)
    flagged = events.select(
        F.col(user_col), F.col(ts_col), F.col(value_col),
        F.when(prev.isNull() | ((ts_s - prev) > gap_seconds), 1)
        .otherwise(0)
        .alias("_new"),
    )
    numbered = flagged.withColumn(
        "_sn", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        numbered.groupBy(user_col, "_sn")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            # decimal accumulator: a plain double SUM's reduction order is
            # partition-dependent and a session total on a .5 rounding
            # boundary could flip vs the oracle (same discipline as
            # salted_agg); cast back to double after the exact sum
            F.round(
                F.sum(F.col(value_col).cast("decimal(28,6)")).cast("double"), 6
            ).alias("total_value"),
        )
        .drop("_sn")
    )
