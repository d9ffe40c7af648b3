"""Oracle-backed STREAMING runs — registry entries that execute a real
Structured Streaming job to completion (file source over the fixture,
availableNow semantics via processAllAvailable, memory sink) and
return the drained result as a batch DataFrame.

Why this module exists: the streaming layer was previously verified
only by pytest parity against its oracle-anchored batch twins. These
entries put the STREAMING execution itself under the driver's
hash-compare — the DuckDB oracle grades the output of an actual
watermarked streaming job, not a batch re-formulation. That is only
possible for jobs whose outputs are deterministic bit-for-bit:

- OHLC: every cell is a picked raw input double (min_by/max_by), no
  float summation anywhere;
- session windows: counts + native int64-microsecond interval
  arithmetic + a DECIMAL-exact value sum;
- EWMA: dyadic weights (powers of two) make every term an
  exponent-shift and the fixed-order 8-term sum bit-exact.

Each run is bounded (the fixture is finite) and the memory-sink table
is per-entry, so repeated invocations in one long-lived session
(bench / driver) replace rather than accumulate.

100 TB: these exact jobs run unbounded with the same plans — the
watermark bounds state (session/EWMA) and complete-mode OHLC would
flip to update-mode emission on hour close; the batch twins' scale
notes apply verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events import EVENTS_OHLC_ORACLE, EVENTS_SESSION_WINDOW_BUILTIN_ORACLE
from .windows import WINDOW_EWMA_ORACLE

#: raw per-micro-batch progress of each entry's LAST run, keyed by
#: registry name — bench.py reads this after timing and records
#: ``streaming.observe.progress_report`` per round, so every bench
#: record carries measured state-extent/eviction evidence for the
#: streaming rows (the stream twin of ``plan_metrics_by_query``)
RUN_PROGRESS: dict[str, list] = {}


def _progress(name: str) -> list:
    """Fresh capture list for one run (cleared so a long-lived session
    never accumulates across bench samples)."""
    lst = RUN_PROGRESS.setdefault(name, [])
    lst.clear()
    return lst


def streaming_run_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the streaming hourly-OHLC job over the events fixture and
    return the drained bars (twin: events.events_ohlc_bars; oracle
    shared — the streaming job must produce the identical table)."""
    from ..streaming import (
        read_events_stream,
        run_to_memory_sink,
        streaming_ohlc_bars,
    )

    stream = read_events_stream(spark, sf_dir)
    return run_to_memory_sink(
        streaming_ohlc_bars(stream),
        "sr_ohlc",
        output_mode="complete",
        progress_out=_progress("streaming_run_ohlc"),
    )


def streaming_run_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the native session_window streaming aggregation and return
    the drained sessions (twin: events.events_session_window_builtin —
    same gap-merge semantics, decimal-exact sums)."""
    from ..streaming import (
        read_events_stream,
        run_to_memory_sink,
        streaming_session_windows,
    )

    stream = read_events_stream(spark, sf_dir)
    out = run_to_memory_sink(
        streaming_session_windows(stream),
        "sr_session",
        output_mode="complete",
        progress_out=_progress("streaming_run_session_window"),
    )
    return out.orderBy("user_id", "session_start")


def streaming_run_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful applyInPandasWithState EWMA stream and return
    every emitted row (twin: windows.window_ewma_dyadic — parity is
    BIT-EXACT by dyadic-weight construction, so the SQL oracle hashes
    the streaming output directly)."""
    from ..streaming import read_events_stream, run_to_memory_sink, streaming_ewma

    stream = read_events_stream(spark, sf_dir)
    out = run_to_memory_sink(
        streaming_ewma(stream),
        "sr_ewma",
        output_mode="append",
        progress_out=_progress("streaming_run_ewma"),
    )
    return out.select("event_id", "user_id", "ts", "value", "ewma").orderBy(
        "user_id", "ts", "event_id"
    )


def streaming_run_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the watermark-bounded streaming dedup
    (``dropDuplicatesWithinWatermark`` on (user_id, event_type)) to
    completion and return the KEY projection of the emitted rows.

    Why the key projection: the operator keeps the FIRST-seen row per
    key, and "first seen" is micro-batch/task arrival order — not
    deterministic — so the full rows can't be hashed. The KEY SET is:
    over the single-file fixture the job runs as one micro-batch, so
    exactly one row per distinct key is emitted and the oracle is a
    plain DISTINCT. A duplicate emission (state dropped too early) or
    a lost key turns the row red — which is precisely the dedup-state
    property worth gating. (Multi-file sources whose event time spans
    beyond the watermark horizon can legitimately re-emit a key after
    state expiry; that at-least-once-per-horizon contract is the
    documented semantics of the underlying job, jobs.py:246.)"""
    from ..streaming import read_events_stream, run_to_memory_sink
    from ..streaming.jobs import streaming_dedup_within_watermark

    stream = read_events_stream(spark, sf_dir)
    out = run_to_memory_sink(
        streaming_dedup_within_watermark(stream),
        "sr_dedup",
        output_mode="append",
        progress_out=_progress("streaming_run_dedup"),
    )
    return out.select("user_id", "event_type").orderBy("user_id", "event_type")


STREAMING_DEDUP_ORACLE = """
SELECT DISTINCT user_id, event_type
FROM events
ORDER BY user_id, event_type
"""


def streaming_run_funnel_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the STREAM-STREAM interval join (click→purchase within 10
    minutes, both sides watermarked — jobs.py::streaming_funnel_join)
    to completion and return every emitted pair.

    Unlike the other runs this grades the join at PAIR granularity —
    the raw (user, click, purchase, ts, ts) matches, not the batch
    twin's per-user aggregate — because an inner interval join's
    output SET is fully deterministic: over the single-batch fixture
    every qualifying pair is emitted exactly once, and timestamps
    pass through unmodified (UTC both engines). A pair dropped by
    over-eager state eviction or emitted twice turns the row red —
    the exact stateful property the watermark-bounded join must hold.
    """
    from ..streaming import read_events_stream, run_to_memory_sink
    from ..streaming.jobs import (
        parquet_input_rows,
        size_state_partitions,
        streaming_funnel_join,
    )

    clicks = read_events_stream(spark, sf_dir)
    purchases = read_events_stream(spark, sf_dir)
    out = run_to_memory_sink(
        streaming_funnel_join(clicks, purchases),
        "sr_funnel",
        output_mode="append",
        # state sized FROM the input volume (r14 verdict item 5 — the
        # r10-era hardcoded 4 was the fixture-right value and wrong at
        # any other volume): size_state_partitions encodes the
        # measured cost model (store commits are disk-fsync-bound:
        # 0.25/0.6/1.9/8 s at 2/4/8/16 partitions on the 100 k-row
        # fixture; see STATE_ROWS_PER_PARTITION) and lands on the same
        # 4 for this fixture, 8 for the outer twin's doubled state.
        # Output is partition-count-invariant (the count only shards
        # state); the input signal is parquet footer metadata, no job.
        state_partitions=size_state_partitions(
            parquet_input_rows(sf_dir), outer=False
        ),
        progress_out=_progress("streaming_run_funnel_join"),
    )
    return out.orderBy("user_id", "click_id", "purchase_id")


STREAMING_FUNNEL_JOIN_ORACLE = """
WITH c AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, c.click_id, p.purchase_id, c.click_ts, p.purchase_ts
FROM c JOIN p ON c.user_id = p.user_id
  AND p.purchase_ts > c.click_ts
  AND p.purchase_ts <= c.click_ts + INTERVAL 10 MINUTE
ORDER BY c.user_id, c.click_id, p.purchase_id
"""


def streaming_run_funnel_join_left(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Run the LEFT OUTER stream-stream interval join to completion —
    the hardest emission semantics in the streaming family: outer-null
    rows may only emit once the watermark PROVES no future match can
    arrive, so a finite stream needs watermark closure
    (``stage_events_with_horizon``: one late sentinel click+purchase
    pair pushes both watermarks past every real row's closing point,
    and Spark's no-data micro-batch flushes the remaining state — the
    production "heartbeat topic" pattern).

    Graded at PAIR granularity against the batch LEFT JOIN: an
    over-eager null emission (row emitted before its match arrived)
    shows up as a spark-only (click, NULL) + (click, purchase) pair;
    over-eager state eviction drops inner pairs; a watermark that
    never closes drops the newest unmatched clicks — each a distinct
    red-row signature.

    The sentinel user is filtered AFTER the memory sink, on the batch
    table — filtering inside the streaming query is the trap the
    join's docstring documents (Catalyst pushes the predicate into
    the parquet scan, where row-group stats skip the sentinel rows
    before the watermark node sees them, and the outer tail silently
    never emits).
    """
    from ..streaming import (
        read_events_stream,
        run_to_memory_sink,
        stage_events_with_horizon,
    )
    from ..streaming.jobs import SENTINEL_USER, streaming_funnel_join_left

    horizon_dir = stage_events_with_horizon(sf_dir)
    clicks = read_events_stream(spark, horizon_dir)
    purchases = read_events_stream(spark, horizon_dir)
    from ..streaming.jobs import parquet_input_rows, size_state_partitions

    out = run_to_memory_sink(
        streaming_funnel_join_left(clicks, purchases),
        "sr_funnel_left",
        output_mode="append",
        # volume-derived (r14 item 5): outer=True doubles the state
        # weight — unmatched rows on BOTH sides are held until
        # watermark closure — landing on 8 for this fixture
        state_partitions=size_state_partitions(
            parquet_input_rows(horizon_dir), outer=True
        ),
        progress_out=_progress("streaming_run_funnel_join_left"),
    )
    return out.filter(F.col("user_id") != SENTINEL_USER).orderBy(
        "user_id", "click_id", "purchase_id"
    )


STREAMING_FUNNEL_JOIN_LEFT_ORACLE = """
WITH c AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, c.click_id, p.purchase_id, c.click_ts, p.purchase_ts
FROM c LEFT JOIN p ON c.user_id = p.user_id
  AND p.purchase_ts > c.click_ts
  AND p.purchase_ts <= c.click_ts + INTERVAL 10 MINUTE
ORDER BY c.user_id, c.click_id, p.purchase_id
"""


QUERIES = {
    "streaming_run_ohlc": streaming_run_ohlc,
    "streaming_run_session_window": streaming_run_session_window,
    "streaming_run_ewma": streaming_run_ewma,
    "streaming_run_dedup": streaming_run_dedup,
    "streaming_run_funnel_join": streaming_run_funnel_join,
    "streaming_run_funnel_join_left": streaming_run_funnel_join_left,
}

ORACLES = {
    "streaming_run_ohlc": EVENTS_OHLC_ORACLE,
    "streaming_run_session_window": EVENTS_SESSION_WINDOW_BUILTIN_ORACLE,
    "streaming_run_ewma": WINDOW_EWMA_ORACLE,
    "streaming_run_dedup": STREAMING_DEDUP_ORACLE,
    "streaming_run_funnel_join": STREAMING_FUNNEL_JOIN_ORACLE,
    "streaming_run_funnel_join_left": STREAMING_FUNNEL_JOIN_LEFT_ORACLE,
}
