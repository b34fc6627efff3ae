"""Structured Streaming ingest (S3/W4/W8 analogs): micro-batch file
source, watermark semantics, checkpointed resume."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pagerank_service_spark.streaming.ingest import (
    read_event_stream,
    user_netflow_stream,
    windowed_type_counts,
)


def _write_batch(d, name, rows):
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _rows(start_id, n, ts_base, etype="purchase"):
    return [
        {
            "event_id": start_id + i,
            "ts": f"2024-01-01T10:{(ts_base + i) % 60:02d}:00.000Z",
            "user_id": (start_id + i) % 5,
            "event_type": etype,
            "value": 10.0,
        }
        for i in range(n)
    ]


def test_stream_counts_and_netflow(spark, tmp_path):
    src = str(tmp_path / "events")
    os.makedirs(src)
    _write_batch(src, "b0.json", _rows(0, 10, 0) + _rows(100, 5, 10, "error"))

    events = read_event_stream(spark, src)
    assert events.isStreaming

    # complete-mode memory sink for the aggregation
    q = (
        user_netflow_stream(events)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("netflow_t")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["user_id"]: r["net"] for r in spark.sql("select * from netflow_t").collect()}
        # 10 purchases of +10 spread over users 0..4 (2 each = +20),
        # 5 errors of -10 over users 0..4 (1 each = -10)
        assert got == {0: 10.0, 1: 10.0, 2: 10.0, 3: 10.0, 4: 10.0}

        # second micro-batch discovered incrementally (S3 cursor analog)
        _write_batch(src, "b1.json", _rows(200, 5, 20))
        q.processAllAvailable()
        got = {r["user_id"]: r["net"] for r in spark.sql("select * from netflow_t").collect()}
        assert got == {0: 20.0, 1: 20.0, 2: 20.0, 3: 20.0, 4: 20.0}
    finally:
        q.stop()


def test_windowed_counts_watermark_schema(spark, tmp_path):
    src = str(tmp_path / "events")
    os.makedirs(src)
    _write_batch(src, "b0.json", _rows(0, 30, 0))
    events = read_event_stream(spark, src)
    agg = windowed_type_counts(events, window="10 minutes", watermark="36 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_t")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from win_t order by window_start").collect()
        assert sum(r["n"] for r in rows) == 30
        assert {r["event_type"] for r in rows} == {"purchase"}
    finally:
        q.stop()


def test_checkpointed_resume(spark, tmp_path):
    """W8: offsets live in the checkpoint — a restarted query does NOT
    reprocess already-committed files."""
    src = str(tmp_path / "events")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    os.makedirs(src)
    _write_batch(src, "b0.json", _rows(0, 8, 0))

    def run_once():
        q = (
            read_event_stream(spark, src)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == 8
    _write_batch(src, "b1.json", _rows(50, 4, 30))
    run_once()
    df = spark.read.parquet(out)
    assert df.count() == 12  # 8 + 4, no reprocessing
    assert df.select("event_id").distinct().count() == 12


def test_module_sinks_pair_with_module_sources(spark, tmp_path):
    """Pairing the module's own sources and sinks must not throw:
    windowed_type_counts -> append parquet sink (watermark-finalized),
    user_netflow_stream -> foreachBatch upsert sink (unbounded agg is
    rejected by append mode)."""
    from pagerank_service_spark.streaming.ingest import (
        start_to_parquet,
        start_upsert_foreach_batch,
    )

    src = str(tmp_path / "events")
    os.makedirs(src)
    _write_batch(src, "b0.json", _rows(0, 20, 0))
    # late finalizer batch: event an hour later pushes the watermark past
    # the first windows so append mode emits them
    _write_batch(src, "b1.json", [{
        "event_id": 999, "ts": "2024-01-01T12:00:00.000Z",
        "user_id": 0, "event_type": "purchase", "value": 1.0,
    }])

    q1 = start_to_parquet(
        windowed_type_counts(read_event_stream(spark, src), window="10 minutes"),
        str(tmp_path / "win_out"), str(tmp_path / "win_cp"), trigger_secs=1,
    )
    q2 = start_upsert_foreach_batch(
        user_netflow_stream(read_event_stream(spark, src)),
        str(tmp_path / "net_out"), str(tmp_path / "net_cp"), trigger_secs=1,
    )
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
        win = spark.read.parquet(str(tmp_path / "win_out"))
        assert win.agg(F.sum("n")).first()[0] == 20  # finalized windows only
        net = spark.read.parquet(str(tmp_path / "net_out"))
        got = {r["user_id"]: r["net"] for r in net.collect()}
        assert got[0] == 41.0 and all(got[u] == 40.0 for u in (1, 2, 3, 4))
    finally:
        q1.stop()
        q2.stop()


def test_rolling_point_store_upsert_and_eviction(spark, tmp_path):
    """applyInPandasWithState rendition of the reference's boost_memory
    store: re-fetched days REPLACE stored rows (W6) and days older than
    the lookback behind the newest day are EVICTED (W3)."""
    from pagerank_service_spark.streaming.state import rolling_point_store

    src = str(tmp_path / "events")
    os.makedirs(src)

    def rows(eid, day, value, n=1):
        return [{"event_id": eid + i, "ts": f"2024-03-{day:02d}T10:00:00.000Z",
                 "user_id": 7, "event_type": "points", "value": value}
                for i in range(n)]

    # collect per-batch emissions on the driver — a memory sink in
    # update mode accumulates EVERY batch's rows, and "order by
    # newest_day" ties across batches (an upsert keeps the same newest
    # day), so "latest state" must come from the latest non-empty batch
    batches: list[list] = []

    def sink(df, _bid):
        out = df.collect()
        if out:
            batches.append(out)

    # batch 1: day 1 = 10, day 2 = 20
    _write_batch(src, "b0.json", rows(0, 1, 10.0) + rows(10, 2, 20.0))
    q = (
        rolling_point_store(read_event_stream(spark, src), lookback_days=3)
        .writeStream.outputMode("update").foreachBatch(sink).start()
    )
    try:
        q.processAllAvailable()
        got = batches[-1][0]
        assert got["window_total"] == 30.0 and got["n_days"] == 2

        # batch 2: day 2 REPLACED with 5 (upsert, not accumulate)
        _write_batch(src, "b1.json", rows(20, 2, 5.0))
        q.processAllAvailable()
        got = batches[-1][0]
        assert got["window_total"] == 15.0 and got["n_days"] == 2  # 10 + 5

        # day 6 arrives -> days 1 and 2 fall out of the 3-day lookback
        _write_batch(src, "b2.json", rows(30, 6, 7.0))
        q.processAllAvailable()
        got = batches[-1][0]
        assert got["newest_day"] == "2024-03-06"
        assert got["n_days"] == 1 and got["window_total"] == 7.0
    finally:
        q.stop()


def test_stream_to_lifecycle_handoff(spark, tmp_path):
    """The FULL reference loop, streaming half to daily half: the
    2-minute scan lands events continuously
    (liquidity_events_job.py:129-197 -> here a checkpointed file-source
    stream appending a day-partitioned landing zone), and the daily
    calculate job consumes a CLOSED day of them
    (calculate_job.py:72-106 -> here the finalized gate: a day is
    consumable only once a later day's events have landed). The
    lifecycle run fed from the stream's landing zone must equal the
    batch path run on the same day's events directly."""
    from pagerank_service_spark.lifecycle import (
        empty_state,
        run_daily_lifecycle,
    )
    from pagerank_service_spark.schemas import LINK_EVENTS
    from pagerank_service_spark.streaming.ingest import (
        closed_days,
        day_events,
        read_link_event_stream,
        start_link_event_landing,
    )

    t0 = 1_700_000_000
    day0 = t0 // 86400

    def ev(seq, a, b, link, start, award=True):
        return {"link_contract": link, "user_a": a, "user_b": b,
                "symbol": "LUCA", "amount_a": 100.0, "amount_b": 100.0,
                "percent_a": 50, "lock_days": 10, "start_time": start,
                "is_award": award, "chain": "bsc", "event_seq": seq}

    d1_rows = [ev(0, "0xA", "0xB", "c1", t0),
               ev(1, "0xB", "0xC", "c2", t0 + 60),
               ev(2, "0xD", "0xD2", "c3", t0 + 120)]
    d2_rows = [ev(10, "0xA", "0xC", "c4", t0 + 86_400)]

    inp = tmp_path / "in"; inp.mkdir()
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = start_link_event_landing(
            read_link_event_stream(spark, str(inp)), landing, ckpt,
            trigger_secs=None)
        q.awaitTermination(120)

    # before the stream's first commit the landing zone doesn't exist:
    # the poller's first tick must read as 'wait', not raise
    assert closed_days(spark, landing) == []

    # only day 1 landed -> the gate holds it back (day not closed)
    (inp / "f1.json").write_text(
        "\n".join(json.dumps(r) for r in d1_rows))
    drain()
    assert closed_days(spark, landing) == []

    # day 2 begins -> the cursor provably crossed the boundary; day 1
    # closes. The second availableNow drain resumes from the CHECKPOINT
    # (only the new file is read — exactly-once, W8).
    (inp / "f2.json").write_text(
        "\n".join(json.dumps(r) for r in d2_rows))
    drain()
    assert closed_days(spark, landing) == [day0]

    coin = spark.createDataFrame(
        [("LUCA", 1.0, 0, 2.0, 2, 0)],
        "symbol string, coefficient double, decimals int, price double, "
        "status int, alone_calculate int")
    no_ranks = spark.createDataFrame([], "user string, rank double")
    streamed = run_daily_lifecycle(
        day_events(spark, landing, day0), coin, empty_state(spark),
        no_ranks, deadline_ts=t0 + 86_400, max_iter=60, tol=1e-9)
    batch = run_daily_lifecycle(
        spark.createDataFrame([tuple(r.values()) for r in d1_rows],
                              LINK_EVENTS),
        coin, empty_state(spark), no_ranks,
        deadline_ts=t0 + 86_400, max_iter=60, tol=1e-9)

    rs = {r["addr"]: r["rank"] for r in streamed.ranks.collect()}
    rb = {r["addr"]: r["rank"] for r in batch.ranks.collect()}
    assert set(rs) == set(rb)
    for k in rs:
        assert abs(rs[k] - rb[k]) < 1e-12
    ss = {(r["link_contract"], r["distance"]) for r in streamed.state.collect()}
    sb = {(r["link_contract"], r["distance"]) for r in batch.state.collect()}
    assert ss == sb
    assert streamed.default_distance == batch.default_distance
