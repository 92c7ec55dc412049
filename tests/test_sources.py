"""Source-side coverage: partition transforms (hidden partitioning),
clickstream fixture (S11), rate changelog source (S10), socket source
(S8, against a real in-process TCP server)."""

from __future__ import annotations

import socket
import threading
import time

from pyspark.sql import functions as F

from lakeshed.catalog import Catalog
from lakeshed.fixtures import EVENT_KINDS, clickstream, clickstream_json_lines
from lakeshed.streaming import parse_changelog, rate_changelog_source
from lakeshed.streaming.changelog import socket_lines


def test_partition_transform_days_and_bucket(spark, tmp_path):
    """D2/D12 — PARTITIONED BY days(ts) + bucket(n, col): derived dirs
    materialize, the derived column stays OUT of the schema, and source
    columns read back intact."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    ev = clickstream(spark, rows=200)
    t = cat.create_table(
        "default.events_p", ev,
        partition_by=("days(timestamp)", "bucket(4, user_id)"),
    )
    assert t.read().columns == ev.columns  # derived cols invisible
    assert t.read().count() == 200
    parts = [r.partition for r in t.partitions().collect()]
    assert any("timestamp_day" in p for p in parts)
    assert any("user_id_bucket" in p for p in parts)
    # appends keep the transform spec
    t.append(clickstream(spark, rows=50, seed=7))
    assert t.read().count() == 250
    # file pruning on the derived bucket dir (partition_values path)
    hit = t.plan_files("user_id_bucket = 0")
    assert 0 < len(hit) < len(t.plan_files())
    assert all("user_id_bucket=0" in a.path for a in hit)


def test_clickstream_fixture_shape_and_determinism(spark):
    a = clickstream(spark, rows=100).collect()
    b = clickstream(spark, rows=100).collect()
    assert a == b
    assert {r.event for r in a} <= set(EVENT_KINDS)
    assert all(0 <= r.viewed_percent < 100 for r in a)
    j = clickstream_json_lines(spark, rows=5).collect()
    assert all(r.value.startswith("{") for r in j)


def test_rate_changelog_source_parses(spark, tmp_path):
    """S10 — the FakerSource analog on the rate source feeds the same
    parse path; run a couple of seconds of processing time and check the
    typed rows land."""
    out: list = []
    parsed = parse_changelog(rate_changelog_source(spark, rows_per_second=50))
    q = (
        parsed.writeStream.format("memory")
        .queryName("rate_sink")
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM rate_sink").collect()
            if len(rows) >= 10:
                out = rows
                break
            time.sleep(1)
    finally:
        q.stop()
    assert len(out) >= 10
    assert all(r.type in ("I", "D") and 0 <= r.block_number < 10 for r in out)
    assert all(len(r.hash) == 64 for r in out)  # sha2-256 hex


def test_socket_source_end_to_end(spark, tmp_path):
    """S8 — a real TCP server (the reference's `nc` stand-in,
    IcebergStream README) feeds lines into the socket source."""
    lines = ["I,1,aaa", "garbage", "I,2,bbb", "D,1,aaa"]

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(("\n".join(lines) + "\n").encode())
            time.sleep(8)  # keep open long enough for a micro-batch

    th = threading.Thread(target=serve, daemon=True)
    th.start()

    parsed = parse_changelog(socket_lines(spark, "127.0.0.1", port))
    q = (
        parsed.writeStream.format("memory")
        .queryName("socket_sink")
        .outputMode("append")
        .start()
    )
    try:
        got: list = []
        deadline = time.time() + 45
        while time.time() < deadline:
            got = spark.sql("SELECT * FROM socket_sink").collect()
            if len(got) >= 3:
                break
            time.sleep(1)
    finally:
        q.stop()
        srv.close()
    assert {(r.type, r.block_number, r.hash) for r in got} == {
        ("I", 1, "aaa"), ("I", 2, "bbb"), ("D", 1, "aaa")
    }

def test_kafka_call_shapes_are_gated(spark):
    """S9/W9 — no broker or spark-sql-kafka jar ships in this container;
    the helpers must build the stock reader plan and fail with the
    standard missing-data-source error at start, not something cryptic."""
    import pytest

    from lakeshed.streaming.kafka import kafka_stream_source

    with pytest.raises(Exception, match="(?i)kafka"):
        kafka_stream_source(spark, "localhost:9092", "clickstream")


def test_kafka_reader_option_contract():
    """S9 — the option set handed to readStream.format('kafka') is the
    stock spark-sql-kafka contract (subscribe + bootstrap + offsets)."""
    from lakeshed.streaming.kafka import kafka_reader_options

    assert kafka_reader_options("broker:9092", "clickstream") == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "clickstream",
        "startingOffsets": "latest",
    }
    assert (
        kafka_reader_options("b:9092", "t", "earliest")["startingOffsets"]
        == "earliest"
    )


def test_kafka_changelog_mapping_on_recorded_frame(spark, tmp_path):
    """S9→W5 without a broker: a recorded frame in the stock kafka source
    schema drives the exact consume-side mapping — binary value → line
    parse (malformed dropped), per-partition offset → __seq → MERGE
    arrival order. The I@offset5-then-D@offset9 key must net to delete
    even though the D row appears FIRST in the frame."""
    from datetime import datetime

    from lakeshed.streaming.kafka import KAFKA_RAW_SCHEMA, kafka_changelog

    ts = datetime(2024, 1, 1)

    def rec(key, val, off):
        return (key.encode(), val.encode(), "clickstream", 0, off, ts, 0)

    raw = spark.createDataFrame(
        [
            rec("1", "D,1,h-old", 9),   # arrives later (offset 9) ...
            rec("1", "I,1,h-new", 5),   # ... than this insert (offset 5)
            rec("2", "I,2,h-two", 6),
            rec("3", "garbage", 7),     # arity != 3 → dropped
            rec("4", "I,NaN,px", 8),    # unparseable key → dropped
        ],
        KAFKA_RAW_SCHEMA,
    )
    parsed = kafka_changelog(raw)
    got = {(r.type, r.block_number, r.hash, r["__seq"]) for r in parsed.collect()}
    assert got == {
        ("D", 1, "h-old", 9),
        ("I", 1, "h-new", 5),
        ("I", 2, "h-two", 6),
    }

    # feed the same MERGE the streaming sink uses: offset order decides
    t = Catalog(spark, str(tmp_path / "wh")).create_table(
        "default.kafka_state",
        spark.createDataFrame([(1, "h0")], "block_number int, hash string"),
    )
    t.merge(
        parsed.select("type", "block_number", "hash", "__seq"),
        on="block_number",
        when_matched_delete="type = 'D'",
        when_matched_update={"hash": "s.hash"},
        when_not_matched_insert="type = 'I'",
        source_order="__seq",
    )
    state = {(r.block_number, r.hash) for r in t.read().collect()}
    assert state == {(2, "h-two")}  # key 1 netted to delete by offset order


def test_kafka_offsets_drive_streaming_upsert(spark, tmp_path):
    """S9→W5 round trip through the REAL streaming sink (VERDICT r04 #6):
    recorded kafka-shaped frames streamed from disk → kafka_changelog →
    changelog_upsert, with __seq taken from the per-partition offset.
    Kafka's ordering contract is per-partition only (a key always lives
    in one partition — the producer keys by user_id, datagen.py:52-56),
    so the frame interleaves partitions out of order and the per-key
    offset order must still decide: I-then-D in ONE batch nets to
    delete, D-then-I nets to insert."""
    from datetime import datetime

    from lakeshed.streaming import changelog_upsert
    from lakeshed.streaming.kafka import KAFKA_RAW_SCHEMA, kafka_changelog

    ts = datetime(2024, 1, 1)

    def rec(key, val, part, off):
        return (key.encode(), val.encode(), "clickstream", part, off, ts, 0)

    # deliberately scrambled arrival order; partition 1 offsets are all
    # SMALLER than partition 0's (cross-partition offsets are unordered)
    rows = [
        rec("1", "D,1,h-old", 0, 9),   # key 1 (p0): I@5 then D@9 → delete
        rec("2", "D,2,h-x", 1, 1),     # key 2 (p1): D@1 then I@3 → insert
        rec("5", "I,5,h-five", 1, 2),  # key 5 (p1): matched → update
        rec("1", "I,1,h-new", 0, 5),
        rec("2", "I,2,h-two", 1, 3),
        rec("9", "garbage-line", 0, 6),  # dropped by the arity filter
    ]
    src = tmp_path / "kafka-rec"
    spark.createDataFrame(rows, KAFKA_RAW_SCHEMA).coalesce(1) \
        .write.parquet(str(src))

    t = Catalog(spark, str(tmp_path / "wh-k")).create_table(
        "default.kafka_stream_state",
        spark.createDataFrame(
            [(1, "h0"), (5, "h0")], "block_number int, hash string"
        ),
    )
    raw = spark.readStream.schema(KAFKA_RAW_SCHEMA).parquet(str(src))
    q = changelog_upsert(
        kafka_changelog(raw), t,
        checkpoint=str(tmp_path / "ckpt-k"),
        trigger={"availableNow": True},
    )
    q.awaitTermination()
    state = {(r.block_number, r.hash) for r in t.read().collect()}
    assert state == {(2, "h-two"), (5, "h-five")}
