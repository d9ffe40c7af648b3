"""Volume-regression gate logic (VERDICT r17 item 4) — pure python,
no Spark: the gate turns `tools/bench_compare.py`'s advisory
"PLAN VOLUME CHANGE" label into a CI failure. Shuffle bytes are
plan x data (box-immune), so measured growth vs the committed
SHUFFLE_AUDIT.json is a plan regression unless an explicit
``volume-waiver: <name>`` CHANGELOG line declares it intended."""

import importlib.util
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "volume_gate", os.path.join(HERE, "tools", "volume_gate.py")
)
vg = importlib.util.module_from_spec(spec)
spec.loader.exec_module(vg)


def _audit(**by_query):
    return {"by_query": {k: {"shuffle_bytes_written": v} for k, v in by_query.items()}}


def test_synthetic_regression_fails():
    """+30% and > floor bytes with no waiver -> regression."""
    res = vg.compare_audits(
        _audit(q=1_000_000), _audit(q=1_300_000), changelog_text=""
    )
    assert [r["name"] for r in res["regressions"]] == ["q"]
    assert res["regressions"][0]["ratio"] == 1.3


def test_waiver_line_exempts():
    """A 'volume-waiver: q' CHANGELOG line moves it to waived."""
    res = vg.compare_audits(
        _audit(q=1_000_000),
        _audit(q=1_300_000),
        changelog_text="## r18\n- volume-waiver: q — intentional rewrite\n",
    )
    assert not res["regressions"]
    assert [r["name"] for r in res["waived"]] == ["q"]


def test_bare_prose_mention_is_not_a_waiver():
    """Old rounds discuss most query names in prose — only the
    explicit prefix waives."""
    res = vg.compare_audits(
        _audit(q=1_000_000),
        _audit(q=1_300_000),
        changelog_text="we rewrote q last round and it was great",
    )
    assert [r["name"] for r in res["regressions"]] == ["q"]


def test_small_absolute_growth_ignored():
    """+50% relative but only 15 KB absolute: AQE/stats noise on a
    KB-scale shuffle, not a plan change."""
    res = vg.compare_audits(_audit(q=30_000), _audit(q=45_000))
    assert not res["regressions"]


def test_under_threshold_ignored_and_shrink_reported():
    res = vg.compare_audits(
        _audit(a=1_000_000, b=1_000_000),
        _audit(a=1_100_000, b=500_000),  # +10% / -50%
    )
    assert not res["regressions"]
    assert [r["name"] for r in res["shrunk"]] == ["b"]


def test_new_entry_is_reported_not_failed():
    res = vg.compare_audits(_audit(a=1_000_000), _audit(a=1_000_000, b=9_999_999))
    assert not res["regressions"]
    assert [r["name"] for r in res["new"]] == ["b"]


def test_zero_baseline_shuffle_appearing():
    """0 -> 1 MB (a shuffle appearing, e.g. broadcast demotion in a
    committed plan) must fail, not divide-by-zero."""
    res = vg.compare_audits(_audit(q=0), _audit(q=1_000_000))
    assert [r["name"] for r in res["regressions"]] == ["q"]
    assert res["regressions"][0]["ratio"] is None


def test_committed_audit_parses_with_gate():
    """The real committed SHUFFLE_AUDIT.json vs itself: identity must
    pass the gate (sanity that field names line up)."""
    import json

    path = os.path.join(HERE, "SHUFFLE_AUDIT.json")
    audit = json.load(open(path))
    res = vg.compare_audits(audit, audit)
    assert not res["regressions"] and not res["new"] and not res["shrunk"]
