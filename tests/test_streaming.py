"""Streaming-layer tests: each streaming query runs over the bounded
events fixture (file source → memory sink, processAllAvailable) and is
compared against its batch twin — the parity SURVEY.md §7 step 5
requires so streaming semantics stay oracle-anchored."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysqldatasynctool_spark.operators import events as ev_ops
from mysqldatasynctool_spark.streaming import (
    foreach_batch_parquet_sink,
    read_events_stream,
    run_to_memory_sink,
    streaming_dedup_within_watermark,
    streaming_session_windows,
    streaming_sliding_counts,
    streaming_sliding_distinct_users,
    streaming_stateful_user_counts,
    streaming_tumbling_counts,
)

SF = "/root/testdata/sf0.001"

try:  # transformWithStateInPandas transport dep — see its test below
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_tumbling_matches_batch_twin(spark):
    stream = read_events_stream(spark, SF)
    out = run_to_memory_sink(
        streaming_tumbling_counts(stream), "t_tumbling", output_mode="complete"
    )
    batch = ev_ops.events_tumbling_window(spark, SF)
    # batch twin uses decimal-sum for the oracle; compare counts and
    # window keys here (sum_value compared approximately)
    s = _rows(out, ["window_start", "event_type", "n"])
    b = _rows(batch, ["window_start", "event_type", "n"])
    assert s == b
    assert abs(
        out.agg(F.sum("sum_value")).collect()[0][0]
        - batch.agg(F.sum("sum_value")).collect()[0][0]
    ) < 1e-6


def test_streaming_ohlc_matches_batch_twin_exactly(spark):
    """OHLC cells are RAW input doubles (picked, never summed), so the
    streaming and batch twins must agree EXACTLY, not approximately."""
    from mysqldatasynctool_spark.streaming import streaming_ohlc_bars

    stream = read_events_stream(spark, SF)
    out = run_to_memory_sink(
        streaming_ohlc_bars(stream), "t_ohlc", output_mode="complete"
    )
    batch = ev_ops.events_ohlc_bars(spark, SF)
    cols = ["hr", "open", "high", "low", "close", "volume"]
    s = _rows(out, cols)
    b = _rows(batch.withColumnRenamed("hr", "hr"), cols)
    assert s and s == b


def test_streaming_sliding_matches_batch_twin(spark):
    stream = read_events_stream(spark, SF)
    out = run_to_memory_sink(
        streaming_sliding_counts(stream), "t_sliding", output_mode="complete"
    )
    batch = ev_ops.events_sliding_window(spark, SF)
    assert _rows(out, ["window_start", "n"]) == _rows(batch, ["window_start", "n"])


def test_streaming_sliding_distinct_matches_batch_twin(spark):
    """Incremental dedup-then-count must equal batch countDistinct
    exactly (same windows, same exact user sets)."""
    stream = read_events_stream(spark, SF)
    out = run_to_memory_sink(
        streaming_sliding_distinct_users(stream),
        "t_sliding_distinct",
        output_mode="complete",
    )
    batch = ev_ops.events_sliding_distinct_users(spark, SF)
    assert _rows(out, ["win_start", "win_end", "n_users"]) == _rows(
        batch, ["win_start", "win_end", "n_users"]
    )


def test_streaming_session_windows(spark):
    stream = read_events_stream(spark, SF)
    out = run_to_memory_sink(
        streaming_session_windows(stream), "t_session", output_mode="complete"
    )
    batch = ev_ops.events_sessionization(spark, SF)
    # session counts must agree: same total events, same number of
    # sessions per user (native session_window vs batch lag/cumsum)
    s = _rows(out.groupBy("user_id").agg(F.count("*").alias("ns"), F.sum("n_events").alias("ne")), ["user_id", "ns", "ne"])
    b = _rows(batch.groupBy("user_id").agg(F.count("*").alias("ns"), F.sum("n_events").alias("ne")), ["user_id", "ns", "ne"])
    assert s == b


def test_streaming_dedup_within_watermark(spark):
    stream = read_events_stream(spark, SF)
    out = run_to_memory_sink(streaming_dedup_within_watermark(stream), "t_dedup")
    # bounded input, everything within horizon → exact dedup semantics
    n_keys = out.select("user_id", "event_type").distinct().count()
    assert out.count() == n_keys
    batch_keys = (
        ev_ops.load(spark, SF, "events").select("user_id", "event_type").distinct().count()
    )
    assert n_keys == batch_keys


def test_streaming_stateful_user_counts(spark):
    stream = read_events_stream(spark, SF)
    out = run_to_memory_sink(
        streaming_stateful_user_counts(stream), "t_stateful", output_mode="update"
    )
    # final state per user (last update wins) must equal batch counts
    final = (
        out.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    )
    batch = (
        ev_ops.load(spark, SF, "events").groupBy("user_id").agg(F.count("*").alias("n_events"))
    )
    assert _rows(final, ["user_id", "n_events"]) == _rows(batch, ["user_id", "n_events"])


def test_stream_static_enrichment(spark):
    from pyspark.sql import functions as F2

    from mysqldatasynctool_spark.streaming import streaming_static_enrichment

    dim = ev_ops.load(spark, SF, "region").select(
        F2.col("r_regionkey").alias("region_key"), "r_name"
    )
    stream = read_events_stream(spark, SF)
    out = run_to_memory_sink(streaming_static_enrichment(stream, dim), "t_enrich")
    assert out.count() == ev_ops.load(spark, SF, "events").count()
    # every event got exactly one region name
    assert out.filter(F2.col("r_name").isNull()).count() == 0
    assert out.select("r_name").distinct().count() == 5


def test_stream_stream_funnel_join_matches_batch_twin(spark):
    """The stream-stream interval join must produce exactly the pairs
    the batch twin's join produces (watermarks only bound state; with
    bounded input and processAllAvailable nothing is dropped)."""
    from mysqldatasynctool_spark.streaming import streaming_funnel_join

    clicks = read_events_stream(spark, SF)
    purchases = read_events_stream(spark, SF)
    out = run_to_memory_sink(
        streaming_funnel_join(clicks, purchases), "t_funnel"
    )
    ev = ev_ops.load(spark, SF, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    expect = c.join(
        p,
        (F.col("user_id") == F.col("pu"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    got = _rows(out, ["click_id", "purchase_id"])
    want = _rows(expect, ["click_id", "purchase_id"])
    assert got and got == want


def test_foreach_batch_sink_roundtrip(spark, tmp_path):
    dest = str(tmp_path / "sink")
    stream = read_events_stream(spark, SF).select("event_id", "user_id", "event_type")
    foreach_batch_parquet_sink(stream, dest)
    written = spark.read.parquet(dest)
    assert written.count() == ev_ops.load(spark, SF, "events").count()


@pytest.mark.live  # transformWithStateInPandas needs google.protobuf
# (its Python<->JVM state-server protocol); absent here and installs
# are disallowed. The processor's state math runs everywhere via
# test_topk_processor_math_without_transport below; this end-to-end
# parity runs wherever protobuf exists: `pytest -m live -k topk`.
def test_transform_with_state_topk_matches_batch(spark):
    """transformWithStateInPandas (the Spark 4 stateful API) parity:
    the per-user running top-3 values must equal the batch top-3
    (window row_number) once all input is processed."""
    if not _HAS_PROTOBUF:
        pytest.fail("google.protobuf missing — this live test needs it")
    from pyspark.sql import Window as W

    from mysqldatasynctool_spark.sources.fixtures import load
    from mysqldatasynctool_spark.streaming import (
        streaming_topk_transform_with_state,
    )

    stream = read_events_stream(spark, SF)
    out = run_to_memory_sink(
        streaming_topk_transform_with_state(stream), "t_tws_topk",
        output_mode="update",
    )
    got = {r.user_id: tuple(r.top_values) for r in out.collect()}

    ev = load(spark, SF, "events")
    w = W.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    batch = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("value"), asc=False).alias("top_values"))
    )
    want = {r.user_id: tuple(r.top_values) for r in batch.collect()}
    assert got == want


def test_multi_batch_incremental_state(spark, tmp_path):
    """TRUE incremental processing: the same events split into 3
    time-ordered files, streamed one file per micro-batch
    (maxFilesPerTrigger=1), must produce the same tumbling-window
    aggregate as one batch pass. Single-file availableNow tests never
    exercise state carried ACROSS micro-batches — which is exactly
    where r4's silent ts bug corrupted results."""
    import os

    from mysqldatasynctool_spark.sources.fixtures import load

    ev = load(spark, SF, "events")
    sf_dir = str(tmp_path)
    # 3 CONTIGUOUS time ranges (ntile over ts order) → the watermark
    # only advances between micro-batches; a round-robin split would
    # make every later batch mostly late data and the parity would
    # depend on complete-mode not dropping late rows
    ordered = ev.orderBy("ts").withColumn(
        "part",
        F.ntile(3).over(__import__("pyspark").sql.Window.orderBy("ts")) - 1,
    )
    for i in range(3):
        (
            ordered.filter(F.col("part") == i)
            .drop("part")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{sf_dir}/events_f{i}.parquet")
        )
    staged = f"{sf_dir}/staged"
    os.makedirs(staged)
    for i in range(3):
        src = next(
            f
            for f in os.listdir(f"{sf_dir}/events_f{i}.parquet")
            if f.endswith(".parquet")
        )
        os.rename(
            f"{sf_dir}/events_f{i}.parquet/{src}", f"{staged}/events-{i:03d}.parquet"
        )
    # point the reader at the staged dir via a fake sf layout
    os.symlink(staged, f"{sf_dir}/events.parquet")

    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    out = run_to_memory_sink(
        streaming_tumbling_counts(stream), "t_multibatch", output_mode="complete"
    )
    batch = ev_ops.events_tumbling_window(spark, SF)
    s = _rows(out, ["window_start", "event_type", "n"])
    b = _rows(batch, ["window_start", "event_type", "n"])
    assert s == b


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Stop a stream after its first micro-batch, restart it from the
    SAME checkpoint, and drain: the final tumbling aggregate must
    equal the batch twin exactly — no lost batches, no double counts.
    This is the exactly-once property every production streaming
    deployment leans on and no single-run test exercises."""
    import os

    from mysqldatasynctool_spark.sources.fixtures import load
    from pyspark.sql import Window as W

    ev = load(spark, SF, "events")
    sf_dir = str(tmp_path)
    staged = f"{sf_dir}/staged"
    os.makedirs(staged)
    # contiguous time split (see test_multi_batch_incremental_state)
    ordered = ev.orderBy("ts").withColumn(
        "part", F.ntile(3).over(W.orderBy("ts")) - 1
    )
    for i in range(3):
        tmp_out = f"{sf_dir}/f{i}"
        ordered.filter(F.col("part") == i).drop("part").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp_out)
        src = next(f for f in os.listdir(tmp_out) if f.endswith(".parquet"))
        os.rename(f"{tmp_out}/{src}", f"{staged}/events-{i:03d}.parquet")
    os.symlink(staged, f"{sf_dir}/events.parquet")
    ckpt = f"{sf_dir}/ckpt"

    def start():
        stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
        return (
            streaming_tumbling_counts(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("t_ckpt")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    # wait for at least one committed micro-batch, then stop mid-stream
    import time as _t

    for _ in range(600):
        if q.lastProgress and q.lastProgress["batchId"] >= 0:
            break
        _t.sleep(0.1)
    q.stop()
    q.awaitTermination(30)

    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    out = spark.sql("SELECT * FROM t_ckpt")
    batch = ev_ops.events_tumbling_window(spark, SF)
    s = _rows(out, ["window_start", "event_type", "n"])
    b = _rows(batch, ["window_start", "event_type", "n"])
    assert s == b


def test_topk_processor_math_without_transport(spark):
    """Drive the ACTUAL _TopK processor (make_topk_processor) through
    a fake state handle — no protobuf transport, runs in every
    environment. Multi-micro-batch semantics: per key, values arrive
    in several separate handleInputRows calls (state must carry
    across), in several pandas chunks per call (all chunks must be
    consumed), and the final emitted top-k must equal the batch
    top-k over the full fixture. Spark is used only to read the
    fixture and compute the expected answer."""
    import pandas as pd

    from pyspark.sql import Window as W

    from mysqldatasynctool_spark.sources.fixtures import load
    from mysqldatasynctool_spark.streaming.jobs import make_topk_processor

    class _FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class _FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema):
            return self.states.setdefault(name, _FakeValueState())

    ev = load(spark, SF, "events").select("user_id", "value", "event_id")
    pdf = ev.toPandas().sort_values("event_id").reset_index(drop=True)

    out = {}
    for uid, grp in pdf.groupby("user_id"):
        proc = make_topk_processor(3)
        handle = _FakeHandle()
        proc.init(handle)
        # arrival order, split into 4 micro-batches of 2 chunks each
        vals = grp["value"].to_numpy()
        batches = [vals[i::4] for i in range(4)]
        last = None
        for b in batches:
            chunks = [pd.DataFrame({"value": b[: len(b) // 2]}),
                      pd.DataFrame({"value": b[len(b) // 2:]})]
            for emitted in proc.handleInputRows((uid,), iter(chunks), None):
                last = emitted
        proc.close()
        assert last is not None
        assert list(last["user_id"]) == [uid]
        out[uid] = tuple(last["top_values"].iloc[0])

    w = W.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    batch = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("value"), asc=False).alias("top_values"))
    )
    want = {r.user_id: tuple(r.top_values) for r in batch.collect()}
    assert out == want


def test_streaming_anomaly_zscore_matches_batch_twin(spark):
    """The stateful trailing z-score flags the SAME events as the
    batch window twin, with z-scores matching to 1e-4 (float deque
    fold vs decimal-exact frame sums; both round values at 6dp)."""
    from mysqldatasynctool_spark.streaming import streaming_anomaly_zscore

    stream = read_events_stream(spark, SF)
    out = run_to_memory_sink(
        streaming_anomaly_zscore(stream), "t_anomaly", output_mode="append"
    )
    batch = ev_ops.QUERIES["events_anomaly_zscore"](spark, SF)
    s = {r.event_id: r.zscore for r in out.collect()}
    b = {r.event_id: r.zscore for r in batch.collect()}
    assert len(b) > 0
    assert set(s) == set(b)
    assert all(abs(s[e] - b[e]) < 1e-4 for e in b)


def test_streaming_ewma_matches_batch_twin_exactly(spark):
    """Dyadic weights make both forms bit-exact — compare EQUALITY of
    every (event_id, ewma), not a tolerance."""
    from mysqldatasynctool_spark.operators import windows as win_ops
    from mysqldatasynctool_spark.streaming import streaming_ewma

    stream = read_events_stream(spark, SF)
    out = run_to_memory_sink(streaming_ewma(stream), "t_ewma", output_mode="append")
    batch = win_ops.QUERIES["window_ewma_dyadic"](spark, SF)
    s = {r.event_id: r.ewma for r in out.collect()}
    b = {r.event_id: r.ewma for r in batch.collect()}
    assert len(b) > 0 and set(s) == set(b)
    assert all(s[e] == b[e] for e in b)


def test_ewma_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Stop the stateful EWMA stream mid-run, restart from the same
    checkpoint into the idempotent epoch-partitioned sink, drain, and
    compare EVERY (event_id, ewma) against the batch twin bit-exactly:
    the recovered deque state and the replayed epoch must both be
    exact, with no duplicate or missing events."""
    import os
    import time as _t

    from pyspark.sql import Window as W

    from mysqldatasynctool_spark.operators import windows as win_ops
    from mysqldatasynctool_spark.sources.fixtures import load
    from mysqldatasynctool_spark.streaming import (
        start_idempotent_parquet_stream,
        streaming_ewma,
    )

    ev = load(spark, SF, "events")
    sf_dir = str(tmp_path)
    staged = f"{sf_dir}/staged"
    os.makedirs(staged)
    ordered = ev.orderBy("ts").withColumn("part", F.ntile(3).over(W.orderBy("ts")) - 1)
    for i in range(3):
        tmp_out = f"{sf_dir}/f{i}"
        ordered.filter(F.col("part") == i).drop("part").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp_out)
        src = next(f for f in os.listdir(tmp_out) if f.endswith(".parquet"))
        os.rename(f"{tmp_out}/{src}", f"{staged}/events-{i:03d}.parquet")
    os.symlink(staged, f"{sf_dir}/events.parquet")
    out_dir, ckpt = f"{sf_dir}/out", f"{sf_dir}/ckpt"

    def start():
        stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
        return start_idempotent_parquet_stream(streaming_ewma(stream), out_dir, ckpt)

    q = start()
    for _ in range(600):
        if q.lastProgress and q.lastProgress["batchId"] >= 0:
            break
        _t.sleep(0.1)
    q.stop()
    q.awaitTermination(30)

    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    out = spark.read.parquet(out_dir)
    s = {r.event_id: r.ewma for r in out.collect()}
    b = {
        r.event_id: r.ewma
        for r in win_ops.QUERIES["window_ewma_dyadic"](spark, SF).collect()
    }
    assert set(s) == set(b)          # no lost or duplicated events
    assert all(s[e] == b[e] for e in b)  # recovered state is bit-exact


def test_cdc_merge_stream_matches_batch_merge(spark, tmp_path):
    """Streaming CDC upsert end-to-end: two change micro-batches merge
    into a versioned snapshot one at a time; the final published
    snapshot equals applying both batches sequentially in batch mode,
    and the version history advanced once per micro-batch."""
    from mysqldatasynctool_spark.operators.compare import apply_cdc
    from mysqldatasynctool_spark.sources.files import (
        read_manifest_version,
        read_versioned,
        write_versioned,
    )
    from mysqldatasynctool_spark.streaming import start_cdc_merge_stream

    root = str(tmp_path / "snap")
    feed = str(tmp_path / "feed")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, val string"
    )
    write_versioned(base, root)
    c1 = spark.createDataFrame(
        [(2, "v2x", "U"), (10, "v10", "I")], "id long, val string, op string"
    )
    c2 = spark.createDataFrame(
        [(3, None, "D"), (10, "v10x", "U")], "id long, val string, op string"
    )
    c1.coalesce(1).write.parquet(f"{feed}/b1")
    c2.coalesce(1).write.parquet(f"{feed}/b2")
    # FileStreamSource orders new files by MODIFICATION TIME; two
    # back-to-back writes can share a coarse mtime, which would make
    # b1-vs-b2 order (and the I-then-U expectation) flaky — pin it
    import os as _os
    import time as _time

    now = _time.time()
    for sub, offset in (("b1", -10), ("b2", 10)):
        d = f"{feed}/{sub}"
        for fn in _os.listdir(d):
            _os.utime(_os.path.join(d, fn), (now + offset, now + offset))
    stream = (
        spark.readStream.schema("id long, val string, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{feed}/*")
    )
    q = start_cdc_merge_stream(
        stream, root, pk="id", checkpoint=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["id"], r["val"]) for r in read_versioned(spark, root).collect()
    )
    # batch truth: order of the two micro-batches follows file order
    want_df = apply_cdc(apply_cdc(base, c1, pk="id"), c2, pk="id")
    want = sorted((r["id"], r["val"]) for r in want_df.collect())
    assert got == want
    assert all(i != 3 for i, _ in got)  # deleted key gone
    assert (10, "v10x") in got  # inserted in batch 1, updated in batch 2
    assert read_manifest_version(root) == 3  # base + one per micro-batch


def test_apply_cdc_lsn_orders_same_key_changes(spark):
    """A batch with TWO changes for one key is deterministic iff the
    feed names its LSN column: highest LSN wins; reversed LSNs flip
    the winner; a same-key U-then-D pair deletes (never resurrects)."""
    from mysqldatasynctool_spark.operators.compare import apply_cdc

    base = spark.createDataFrame([(1, "old")], "id long, val string")
    iu = spark.createDataFrame(
        [(1, "first", "U", 100), (1, "second", "U", 200)],
        "id long, val string, op string, lsn long",
    )
    got = apply_cdc(base, iu, pk="id", lsn_col="lsn").collect()
    assert [(r["id"], r["val"]) for r in got] == [(1, "second")]
    ud = spark.createDataFrame(
        [(1, "upd", "U", 100), (1, None, "D", 200)],
        "id long, val string, op string, lsn long",
    )
    assert apply_cdc(base, ud, pk="id", lsn_col="lsn").count() == 0


def test_cdc_merge_stream_checkpoint_recovery(spark, tmp_path):
    """Kill the CDC upsert stream after its first micro-batch, restart
    from the SAME checkpoint, drain: the final snapshot must equal the
    sequential batch merge (no lost change batch, no double-publish
    corruption) — the latest-wins compaction is content-idempotent, so
    even a replayed epoch converges to the same rows."""
    import os
    import time

    from mysqldatasynctool_spark.operators.compare import apply_cdc
    from mysqldatasynctool_spark.sources.files import (
        read_versioned,
        write_versioned,
    )
    from mysqldatasynctool_spark.streaming import start_cdc_merge_stream

    root = str(tmp_path / "snap")
    feed = str(tmp_path / "feed")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(8)], "id long, val string"
    )
    write_versioned(base, root)
    batches = [
        spark.createDataFrame(
            [(1, "b1", "U"), (8, "b1", "I")], "id long, val string, op string"
        ),
        spark.createDataFrame(
            [(2, None, "D"), (8, "b2", "U")], "id long, val string, op string"
        ),
        spark.createDataFrame(
            [(3, "b3", "U")], "id long, val string, op string"
        ),
    ]
    now = time.time()
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(f"{feed}/b{i}")
        for fn in os.listdir(f"{feed}/b{i}"):
            os.utime(
                os.path.join(f"{feed}/b{i}", fn), (now + 10 * i, now + 10 * i)
            )
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema("id long, val string, op string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{feed}/*")
        )
        return start_cdc_merge_stream(stream, root, pk="id", checkpoint=ckpt)

    q = start()
    # let exactly one micro-batch commit, then kill mid-stream
    deadline = time.time() + 60
    while not q.recentProgress and time.time() < deadline:
        time.sleep(0.3)
    q.stop()
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    want_df = base
    for b in batches:
        want_df = apply_cdc(want_df, b, pk="id")
    got = sorted(
        (r["id"], r["val"]) for r in read_versioned(spark, root).collect()
    )
    want = sorted((r["id"], r["val"]) for r in want_df.collect())
    assert got == want
    assert (8, "b2") in got and all(i != 2 for i, _ in got)


def test_apply_cdc_replayed_older_batch_cannot_regress(spark):
    """With an LSN column, the merged snapshot RETAINS each key's
    applied LSN, so a redelivered OLDER change batch (at-least-once
    delivery / checkpoint reset) can never regress a newer row."""
    from mysqldatasynctool_spark.operators.compare import apply_cdc

    base = spark.createDataFrame([(1, "old", None)], "id long, val string, lsn long")
    newer = spark.createDataFrame(
        [(1, "new", "U", 500)], "id long, val string, op string, lsn long"
    )
    snap1 = apply_cdc(base, newer, pk="id", lsn_col="lsn")
    assert [(r["id"], r["val"], r["lsn"]) for r in snap1.collect()] == [
        (1, "new", 500)
    ]
    stale = spark.createDataFrame(
        [(1, "stale", "U", 100)], "id long, val string, op string, lsn long"
    )
    snap2 = apply_cdc(snap1, stale, pk="id", lsn_col="lsn")
    assert [(r["id"], r["val"], r["lsn"]) for r in snap2.collect()] == [
        (1, "new", 500)
    ]


def test_left_outer_funnel_join_stream_matches_batch(spark):
    """The r11 LEFT OUTER stream-stream run must equal the batch LEFT
    JOIN at pair granularity: inner pairs identical to the inner run,
    outer rows exactly the unmatched clicks, no sentinel leakage, no
    duplicate emission (over-eager nulls would show as a (click, NULL)
    row COEXISTING with that click's matched rows)."""
    from mysqldatasynctool_spark.operators.streamruns import (
        streaming_run_funnel_join,
        streaming_run_funnel_join_left,
    )

    sf = "/root/testdata/sf0.01"
    left = streaming_run_funnel_join_left(spark, sf).collect()
    inner = streaming_run_funnel_join(spark, sf).collect()
    assert left and all(r.user_id >= 0 for r in left)
    inner_pairs = {(r.user_id, r.click_id, r.purchase_id) for r in inner}
    left_inner = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in left
        if r.purchase_id is not None
    }
    assert left_inner == inner_pairs
    matched_clicks = {(u, c) for u, c, _ in left_inner}
    null_clicks = {
        (r.user_id, r.click_id) for r in left if r.purchase_id is None
    }
    # a click is EITHER matched or null-emitted, never both
    assert not (matched_clicks & null_clicks)
    # every click emits exactly once per distinct qualifying purchase,
    # and null rows are unique per click
    keys = [(r.user_id, r.click_id, r.purchase_id) for r in left]
    assert len(keys) == len(set(keys))


def test_progress_report_on_real_run(spark):
    """progress_report over a real drained watermarked-session run:
    throughput + state-operator extent reported, raw series kept, no
    growth warning on a bounded backfill."""
    from mysqldatasynctool_spark.streaming import (
        progress_report,
        read_events_stream,
        run_to_memory_sink,
        streaming_session_windows,
    )

    stream = read_events_stream(spark, "/root/testdata/sf0.001")
    captured: list = []
    df = run_to_memory_sink(
        streaming_session_windows(stream),
        "obs_sessions",
        output_mode="append",
        progress_out=captured,
    )
    assert df.count() > 0 and captured
    rep = progress_report(captured)
    assert rep["n_batches"] >= 1
    assert rep["input_rows"] == 1000  # sf0.001 events rows
    ops = rep["state_operators"]
    assert ops and ops[0]["memory_used_bytes_max"] > 0
    assert ops[0]["rows_total_series"]  # raw evidence retained
    assert rep["max_batch_duration_ms"] > 0
    assert rep["warnings"] == []  # bounded drain, no growth signature


def test_progress_report_growth_warning_on_synthetic_series():
    """The unbounded-state signature (monotone growth, zero eviction,
    >=3 batches) warns; eviction or too few batches must not."""
    from mysqldatasynctool_spark.streaming.observe import progress_report

    def batch(bid, rows_total, removed=0, dropped=0):
        return {
            "batchId": bid,
            "numInputRows": 100,
            "processedRowsPerSecond": 1000.0,
            "batchDuration": 50,
            "eventTime": {"watermark": "1970-01-01T00:00:00.000Z"},
            "stateOperators": [
                {
                    "operatorName": "stateStoreSave",
                    "numRowsTotal": rows_total,
                    "numRowsUpdated": 100,
                    "numRowsRemoved": removed,
                    "numRowsDroppedByWatermark": dropped,
                    "memoryUsedBytes": rows_total * 100,
                    "numShufflePartitions": 8,
                }
            ],
        }

    growing = [batch(i, 100 * (i + 1)) for i in range(4)]
    rep = progress_report(growing)
    assert rep["warnings"] and "zero eviction" in rep["warnings"][0]
    assert rep["state_operators"][0]["state_growth_warning"] is True
    assert rep["state_operators"][0]["rows_total_series"] == [100, 200, 300, 400]

    evicting = [batch(i, 100 * (i + 1), removed=5) for i in range(4)]
    assert progress_report(evicting)["warnings"] == []

    short = [batch(i, 100 * (i + 1)) for i in range(2)]
    assert progress_report(short)["warnings"] == []

    # a PLATEAU batch (no-data micro-batch) must not mask the leak —
    # the signature is non-decreasing with net growth, not strictly
    # monotone (r17 review finding)
    plateau = [batch(0, 100), batch(1, 200), batch(2, 200), batch(3, 300)]
    assert progress_report(plateau)["warnings"]

    # ...but a DECREASE is eviction evidence and breaks the signature
    shrank = [batch(0, 100), batch(1, 200), batch(2, 150), batch(3, 300)]
    assert progress_report(shrank)["warnings"] == []

    empty = progress_report([])
    assert empty["n_batches"] == 0
    # full schema even when empty (consumers diff records across rounds)
    assert set(empty) == {
        "n_batches",
        "input_rows",
        "avg_processed_rows_per_s",
        "max_batch_duration_ms",
        "last_watermark",
        "state_operators",
        "warnings",
    }
