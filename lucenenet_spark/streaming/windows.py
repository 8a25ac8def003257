"""Event-time windowed operators (Structured Streaming surface).

These run identically on a batch DataFrame and a streaming one — the
functions take either; tests exercise both paths, and the driver's
correctness gate checks the batch semantics against SQL.

Determinism note: aggregating DOUBLE with `sum` is order-sensitive in
the last ulp, so cross-engine-checked sums go through DECIMAL(18,2)
(exact, order-independent) and widen to double at the end; window
boundaries are exported as epoch seconds (integer) to dodge
timestamp-timezone representation drift.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time windows × event_type: (window_start
    epoch-sec, event_type, n_events, sum_value). With ``watermark`` set
    and a streaming input this is the standard late-data-tolerant
    windowed aggregation (watermark bounds state; late events beyond it
    drop)."""
    # watermarks require TIMESTAMP (LTZ); parquet often infers NTZ —
    # the cast is value-identical under the pinned UTC session TZ
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if watermark:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            F.col("sv").cast("double").alias("sum_value"),
        )
    )


def event_sessions(
    events: DataFrame, gap: str = "30 minutes", ts_col: str = "ts"
) -> DataFrame:
    """Per-user session windows (gap-based): (user_id, session_start
    epoch-sec, n_events). ``session_window`` is streaming-capable with
    a watermark; batch semantics equal the gaps-and-islands SQL."""
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
        )
    )


RUNNING_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _update_user_totals(
    key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState worker: cumulative per-user event count
    and value total across micro-batches (the custom stateful-operator
    extension point; state survives between triggers)."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Attach the stateful running-totals operator to a streaming
    DataFrame (update output mode)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
