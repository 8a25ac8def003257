"""Event-time windowed + stateful streaming operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.streaming.windows import (
    event_sessions,
    running_user_totals,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_windowed_counts_batch(events):
    out = windowed_event_counts(events, "1 hour").collect()
    assert sum(r["n_events"] for r in out) == events.count()
    # windows are hour-aligned epochs
    assert all(r["window_start"] % 3600 == 0 for r in out)


def test_sessions_cover_all_events(events):
    out = event_sessions(events, "30 minutes").collect()
    assert sum(r["n_events"] for r in out) == events.count()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r["session_start"])
    # session starts strictly increasing per user
    for starts in by_user.values():
        s = sorted(starts)
        assert len(set(s)) == len(s)


def test_streaming_windowed_counts_match_batch(spark, events, tmp_path):
    src = str(tmp_path / "ev_src")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        windowed_event_counts(stream, "1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from win_counts").collect()
    }
    expect = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(events, "1 hour").collect()
    }
    assert got == expect


def test_stateful_running_totals_across_batches(spark, events, tmp_path):
    # two files -> two micro-batches (maxFilesPerTrigger=1); state must
    # carry the first batch's totals into the second
    src = str(tmp_path / "state_src")
    half = events.where("event_id % 2 = 0")
    other = events.where("event_id % 2 = 1")
    half.coalesce(1).write.mode("overwrite").parquet(src)
    other.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("run_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # last emitted row per user = final cumulative totals
    rows = spark.sql("select * from run_totals").collect()
    final: dict[int, tuple[int, float]] = {}
    for r in rows:  # memory sink appends per batch; later rows overwrite
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    expect = {
        r["user_id"]: (r["n"], r["tv"])
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(final) == set(expect)
    for u in final:
        assert final[u][0] == expect[u][0]
        assert final[u][1] == pytest.approx(expect[u][1], rel=1e-9)
