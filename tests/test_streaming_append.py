"""Append-mode watermark semantics for the tumbling-hourly stream
(streaming/windows.py) — the DEPLOYMENT output mode, which the complete-mode
parity harness deliberately does not exercise (SCALE.md caveat).

Asserts across ≥3 micro-batches that (a) append emits ONLY windows the
watermark has finalized, (b) a row arriving behind the watermark is dropped
(visible in numRowsDroppedByWatermark), (c) the still-open window is
withheld at end-of-stream.

Late-filter timing gotcha (SPARK-42376, Spark ≥3.4): stateful operators
filter late rows against the PREVIOUS micro-batch's watermark while evicting
against the current one, so a row must arrive ≥2 batches after the data that
out-watermarked it to actually be dropped — hence three source files here,
with the late row in the third.
"""

import datetime as dt
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from azure_medicine_data_engineering_spark.operators.event_windows import (
    tumbling_hourly_agg,
)


def _write_events(path, rows):
    ts, etype, val = zip(*rows)
    table = pa.table(
        {
            "ts": pa.array(list(ts), pa.timestamp("us")),
            "event_type": pa.array(list(etype)),
            "value": pa.array(list(val), pa.float64()),
        }
    )
    pq.write_table(table, path)


def test_append_mode_emits_finalized_windows_and_drops_late_rows(spark, tmp_path):
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    src = tmp_path / "events_src"
    os.makedirs(src)
    # batch 0: three rows in [10,11), one in [11,12) → wm after commit 10:30
    _write_events(
        str(src / "b1.parquet"),
        [
            (t(10, 5), "click", 1.0),
            (t(10, 15), "click", 2.0),
            (t(10, 45), "view", 3.0),
            (t(11, 30), "click", 4.0),
        ],
    )
    time.sleep(1.1)  # file-source orders micro-batches by mod time
    # batch 1: advances wm to 13:00 at commit
    _write_events(str(src / "b2.parquet"), [(t(14, 0), "click", 5.0)])
    time.sleep(1.1)
    # batch 2: one row at 9:30 — behind even the PREVIOUS batch's watermark
    # (10:30), so the late filter genuinely drops it — plus a fresh row
    _write_events(
        str(src / "b3.parquet"),
        [(t(9, 30), "late", 9.0), (t(14, 10), "click", 6.0)],
    )

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
    )
    q = (
        tumbling_hourly_agg(stream)
        .writeStream.format("memory")
        .queryName("append_tumbling")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    progress = q.recentProgress
    assert len(progress) >= 3  # genuinely incremental
    dropped = sum(
        s["numRowsDroppedByWatermark"]
        for p in progress
        for s in p.get("stateOperators", [])
    )
    assert dropped == 1  # the 9:30 row, and only it

    out = {
        (r.window_start.hour, r.event_type): (r.n, r.total_value)
        for r in spark.table("append_tumbling").collect()
    }
    # finalized windows (end ≤ final watermark 13:10) emitted exactly once
    assert out == {
        (10, "click"): (2, 3.0),
        (10, "view"): (1, 3.0),
        (11, "click"): (1, 4.0),
    }
    # [9,10) absent → late row dropped; [14,15) absent → open window withheld
    assert not any(h in (9, 14) for h, _ in out)


def test_session_window_append_finalizes_on_gap(spark, tmp_path):
    """Session windows in append mode: a session emits once its gap has
    passed the watermark; an active session is withheld."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from azure_medicine_data_engineering_spark.operators.event_windows import (
        session_30m_agg,
    )

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    src = tmp_path / "sess_src"
    os.makedirs(src)

    def w(name, rows):
        ts, uid = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "ts": pa.array(list(ts), pa.timestamp("us")),
                    "user_id": pa.array(list(uid), pa.int64()),
                }
            ),
            str(src / name),
        )

    # user 1: burst at 10:00-10:10 (session closes at 10:40)
    w("b1.parquet", [(t(10, 0), 1), (t(10, 10), 1)])
    time.sleep(1.1)
    # advance watermark far past the session close; user 2 session stays open
    w("b2.parquet", [(t(13, 0), 2)])

    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
    )
    q = (
        session_30m_agg(stream)
        .writeStream.format("memory")
        .queryName("append_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    q.awaitTermination()
    rows = spark.table("append_sessions").collect()
    # only user 1's closed session is emitted; user 2's is inside the horizon
    assert [(r.user_id, r.events_in_session) for r in rows] == [(1, 2)]
