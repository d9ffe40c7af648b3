"""Canary for fixture-regeneration drift.

The driver regenerates /root/testdata between rounds and has already
shipped events.ts as parquet TIMESTAMP(NANOS) (r1-r3) and
TIMESTAMP(MICROS) without tz (r4, which Spark reads as TIMESTAMP_NTZ
— that flip silently broke 3 queries and the whole streaming layer).
This suite synthesizes every plausible encoding of the events table
and asserts the batch loader AND the streaming reader normalize each
to the same plain UTC TIMESTAMP with the same epoch values, so the
next regeneration fails HERE, loudly, not in the driver's rotation.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mysqldatasynctool_spark.sources.fixtures import load

#: one known instant, expressed in epoch micros (UTC)
EPOCH_US = [1_700_000_000_000_000, 1_700_000_123_456_789]


def _write_events(tmp_path, ts_array, int96: bool = False) -> str:
    sf_dir = str(tmp_path)
    n = len(EPOCH_US)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([1.0] * n),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(
        table,
        os.path.join(sf_dir, "events.parquet"),
        use_deprecated_int96_timestamps=int96,
    )
    return sf_dir


ENCODINGS = {
    "nanos_no_tz": pa.array(
        [us * 1000 for us in EPOCH_US], pa.timestamp("ns")
    ),
    "micros_no_tz": pa.array(EPOCH_US, pa.timestamp("us")),
    "micros_utc_tz": pa.array(EPOCH_US, pa.timestamp("us", tz="UTC")),
    "millis_no_tz": pa.array(
        [us // 1000 for us in EPOCH_US], pa.timestamp("ms")
    ),
}

#: millis loses sub-ms precision by construction; truncate expectations
def _expected_us(name: str) -> list[int]:
    if name == "millis_no_tz":
        return [us // 1000 * 1000 for us in EPOCH_US]
    return list(EPOCH_US)


@pytest.mark.parametrize("name", sorted(ENCODINGS))
def test_batch_load_normalizes_ts(spark, tmp_path, name):
    sf_dir = _write_events(tmp_path, ENCODINGS[name])
    df = load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", (
        f"{name}: load() must yield plain TIMESTAMP, got "
        f"{dict(df.dtypes)['ts']}"
    )
    got = [
        r[0]
        for r in df.select(
            (F.unix_micros(F.col("ts"))).alias("us")
        )
        .orderBy("us")
        .collect()
    ]
    assert got == _expected_us(name), f"{name}: epoch drift"
    # every downstream epoch idiom must work on the normalized column
    df.select(F.col("ts").cast("long"), F.unix_timestamp("ts")).collect()


@pytest.mark.parametrize("name", ["nanos_no_tz", "micros_no_tz"])
def test_streaming_reader_matches_batch(spark, tmp_path, name):
    """The streaming schema is declared, not inferred — a mismatch
    parses WITHOUT error and lands 1000x-wrong timestamps (r4's
    silent failure). Assert stream == batch per encoding."""
    from mysqldatasynctool_spark.streaming.jobs import (
        read_events_stream,
        run_to_memory_sink,
    )

    sf_dir = _write_events(tmp_path, ENCODINGS[name])
    batch_us = sorted(
        r[0]
        for r in load(spark, sf_dir, "events")
        .select(F.unix_micros("ts"))
        .collect()
    )
    stream = read_events_stream(spark, sf_dir)
    out = run_to_memory_sink(
        stream.select(F.unix_micros("ts").alias("us")), f"canary_{name}"
    )
    got = sorted(r[0] for r in out.collect())
    assert got == batch_us, f"{name}: stream/batch epoch mismatch"


def test_batch_load_normalizes_int96(spark, tmp_path):
    """INT96 — Spark's own legacy parquet timestamp output (what any
    Spark-written staging of the events table produces by default):
    batch load must read it as plain TIMESTAMP with intact epochs."""
    sf_dir = _write_events(
        tmp_path,
        pa.array([us * 1000 for us in EPOCH_US], pa.timestamp("ns")),
        int96=True,
    )
    df = load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r[0] for r in df.select(F.unix_micros("ts")).collect())
    assert got == list(EPOCH_US)


def test_streaming_reader_int96_matches_batch(spark, tmp_path):
    from mysqldatasynctool_spark.streaming.jobs import (
        read_events_stream,
        run_to_memory_sink,
    )

    sf_dir = _write_events(
        tmp_path,
        pa.array([us * 1000 for us in EPOCH_US], pa.timestamp("ns")),
        int96=True,
    )
    batch_us = sorted(
        r[0]
        for r in load(spark, sf_dir, "events").select(F.unix_micros("ts")).collect()
    )
    out = run_to_memory_sink(
        read_events_stream(spark, sf_dir).select(F.unix_micros("ts").alias("us")),
        "canary_int96",
    )
    assert sorted(r[0] for r in out.collect()) == batch_us


def test_probe_ts_unit_multi_file_homogeneous(tmp_path):
    """Directory fixtures: the probe must survey every footer, not
    just the first — and agree with the single-file answer."""
    from mysqldatasynctool_spark.streaming.jobs import _probe_ts_unit

    d = tmp_path / "events.parquet"
    d.mkdir()
    n = len(EPOCH_US)
    for i in range(3):
        table = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array([u * 1000 for u in EPOCH_US], pa.timestamp("ns")),
            }
        )
        pq.write_table(table, str(d / f"part-{i}.parquet"))
    assert _probe_ts_unit(str(d)) == "ns"


def test_probe_ts_unit_rejects_mixed_encodings(tmp_path):
    """A regenerated multi-file events dir with DIFFERENT ts encodings
    per file cannot be described by one declared schema; silently
    trusting file 0 is exactly the corruption class the probe guards
    against, so it must raise instead."""
    from mysqldatasynctool_spark.streaming.jobs import _probe_ts_unit

    d = tmp_path / "events.parquet"
    d.mkdir()
    n = len(EPOCH_US)
    enc = {
        "part-0.parquet": pa.array([u * 1000 for u in EPOCH_US], pa.timestamp("ns")),
        "part-1.parquet": pa.array(EPOCH_US, pa.timestamp("us")),
    }
    for fname, arr in enc.items():
        table = pa.table(
            {"event_id": pa.array(range(n), pa.int64()), "ts": arr}
        )
        pq.write_table(table, str(d / fname))
    with pytest.raises(ValueError, match="heterogeneous"):
        _probe_ts_unit(str(d))
