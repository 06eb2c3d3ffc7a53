"""CLI — the reference's ``minerva`` command surface, Spark-backed.

Reference commands (minerva/commands/* [U]) → subcommands here:

    initialize            load + validate a YAML instance directory
    load-data             harvest a file into a trend store (§3.1)
    materialize           incremental materialization run (§3.2)
    create-notifications  evaluate a trigger, append notifications
    aggregate             run a declared part aggregation (the
                          ``minerva aggregation create`` analog —
                          compiled and executed, not SQL-generated)
    compact               bin-pack small files in a parquet store
    bench                 run the headline benchmark

Usage: ``python -m python_minerva_etl_spark.cli <command> …``
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from .session import get_spark
    s = get_spark(app_name="minerva-cli")
    s.sparkContext.setLogLevel("ERROR")
    return s


def cmd_initialize(args) -> int:
    from .plans.yaml_instance import MinervaInstance
    try:
        inst = MinervaInstance.load(args.instance_dir)
    except FileNotFoundError as exc:
        print(str(exc), file=sys.stderr)
        return 1
    summary = {
        "trend_stores": [
            {"data_source": ts.data_source, "entity_type": ts.entity_type,
             "granularity": ts.granularity,
             "parts": {p.name: len(p.trends) for p in ts.parts}}
            for ts in inst.trend_stores],
        "relations": [r.name for r in inst.relations],
        "triggers": [t.name for t in inst.triggers],
        "materializations": [m.name for m in inst.materializations],
    }
    print(json.dumps(summary))
    return 0


def cmd_load_data(args) -> int:
    from .plans.load import load_data
    from .sources.csv import ParserConfig
    spark = _spark()
    cfg = ParserConfig(
        delimiter=args.delimiter,
        timestamp_column=args.timestamp_column,
        timestamp_format=args.timestamp_format,
        entity_expression=args.entity_expression)
    out = load_data(spark, args.file_type, args.path, args.target, cfg,
                    granularity=args.granularity,
                    modified_log_path=args.modified_log)
    print(json.dumps({"loaded_rows": out.count(), "target": args.target}))
    return 0


def cmd_materialize(args) -> int:
    from pyspark.sql import functions as F

    from .operators.materialization import materialize_incremental
    spark = _spark()
    source = spark.read.parquet(args.source)

    def compute(src):
        aggs = [F.count("*").alias("samples")]
        for c in args.sum_columns or []:
            aggs.append(F.sum(F.col(c).cast("decimal(28,6)")).cast("double")
                        .alias(f"sum_{c}"))
        return src.groupBy(args.entity_column, "__bucket").agg(*aggs)

    n = materialize_incremental(
        spark, source, args.timestamp_column, args.granularity,
        compute, args.target, args.state)
    print(json.dumps({"recomputed_buckets": n}))
    return 0


def cmd_create_notifications(args) -> int:
    from .operators.notification import append_notifications
    from .operators.trigger import evaluate
    from .plans.yaml_instance import MinervaInstance
    spark = _spark()
    inst = MinervaInstance.load(args.instance_dir)
    rules = {t.name: t for t in inst.triggers}
    if args.trigger not in rules:
        print(f"unknown trigger {args.trigger!r}; have {sorted(rules)}",
              file=sys.stderr)
        return 2
    source = spark.read.parquet(args.source)
    notif = evaluate(source, rules[args.trigger],
                     entity_col=args.entity_column,
                     ts_col=args.timestamp_column)
    append_notifications(notif, args.target, ts_col=args.timestamp_column)
    print(json.dumps({"notifications": notif.count(), "target": args.target}))
    return 0


def cmd_aggregate(args) -> int:
    """The reference's ``minerva aggregation create`` analog: compile a
    declared part's aggregation (time and/or entity-relation) and run
    it source → target, instead of generating SQL files."""
    from .plans.instance import aggregate_entity, aggregate_time
    from .plans.yaml_instance import MinervaInstance

    inst = MinervaInstance.load(args.instance_dir)
    stores = {ts.data_source: ts for ts in inst.trend_stores}
    if args.data_source not in stores:
        print(f"unknown data source {args.data_source!r}; "
              f"have {sorted(stores)}", file=sys.stderr)
        return 2
    parts = {p.name: p for p in stores[args.data_source].parts}
    if args.part not in parts:
        print(f"unknown part {args.part!r}; have {sorted(parts)}",
              file=sys.stderr)
        return 2
    part = parts[args.part]

    spark = _spark()
    df = spark.read.parquet(args.source)
    if args.target_granularity:
        df = aggregate_time(df, part, args.entity_column,
                            args.timestamp_column, args.target_granularity)
    if args.relation:
        if not args.relation_table:
            print("--relation requires --relation-table", file=sys.stderr)
            return 2
        relations = {r.name: r for r in inst.relations}
        if args.relation not in relations:
            print(f"unknown relation {args.relation!r}; "
                  f"have {sorted(relations)}", file=sys.stderr)
            return 2
        relation_df = spark.read.parquet(args.relation_table)
        df = aggregate_entity(df, part, relation_df,
                              relations[args.relation],
                              args.entity_column, args.timestamp_column)
    df.write.mode("overwrite").parquet(args.target)
    print(json.dumps({"rows": spark.read.parquet(args.target).count(),
                      "target": args.target}))
    return 0


def cmd_compact(args) -> int:
    from .operators.compaction import compact_store

    spark = _spark()
    stats = compact_store(spark, args.path, args.partition_col,
                          target_file_bytes=args.target_file_mb << 20)
    print(json.dumps(stats))
    return 0


def cmd_delta(args) -> int:
    """Delta table maintenance/ops: optimize | vacuum | delete |
    changes (the engine's from-scratch protocol implementation —
    works on tables other engines wrote)."""
    from .storage.delta import DeltaTable

    spark = _spark()
    dt = DeltaTable(args.path)
    if args.action == "optimize":
        v = dt.optimize(spark,
                        zorder_by=args.zorder_by.split(",")
                        if args.zorder_by else None,
                        incremental=args.incremental)
        print(json.dumps({"optimized_version": v}))
    elif args.action == "vacuum":
        deleted = dt.vacuum(args.retention_hours,
                            allow_short_retention=args.force)
        print(json.dumps({"deleted_files": len(deleted)}))
    elif args.action == "delete":
        if not args.where:
            print("delete requires --where", flush=True)
            return 2
        v = dt.delete(spark, args.where)
        print(json.dumps({"delete_version": v}))
    elif args.action == "changes":
        df = dt.changes(spark, args.start,
                        args.end if args.end >= 0 else None)
        df.show(args.limit, truncate=False)
    elif args.action == "update":
        if not args.set:
            print("update requires --set col=expr", flush=True)
            return 2
        sets = dict(kv.split("=", 1) for kv in args.set)
        v = dt.update(spark, sets, args.where)
        print(json.dumps({"update_version": v}))
    elif args.action == "restore":
        if args.version < 0:
            print("restore requires --version", flush=True)
            return 2
        v = dt.restore(spark, args.version)
        print(json.dumps({"restore_version": v}))
    elif args.action == "set-properties":
        if not args.set:
            print("set-properties requires --set key=value",
                  flush=True)
            return 2
        props = dict(kv.split("=", 1) for kv in args.set)
        v = dt.set_properties(props)
        print(json.dumps({"properties_version": v}))
    return 0


def _iceberg_preds(exprs: list[str]) -> list[tuple]:
    """Parse repeatable ``--where "col<op>literal"`` flags into the
    reader/DML predicate shape (longest op first so '<=' never parses
    as '<'); numeric literals become int/float, everything else stays
    a string."""
    import re

    preds = []
    for e in exprs:
        m = re.match(r"^\s*(\w+)\s*(<=|>=|=|<|>)\s*(.+?)\s*$", e)
        if not m:
            raise SystemExit(f"bad --where {e!r} (want col<op>value "
                             "with op in =, <, <=, >, >=)")
        col, op, lit = m.groups()
        for cast in (int, float):
            try:
                lit = cast(lit)
                break
            except ValueError:
                continue
        preds.append((col, op, lit))
    return preds


def cmd_iceberg(args) -> int:
    """Iceberg table ops: compact | expire | delete | update (the
    merge-on-read DML writers — position deletes + new data files,
    never a full rewrite)."""
    from .storage.iceberg_write import (compact_iceberg, delete_iceberg,
                                        expire_snapshots,
                                        update_iceberg)

    if args.action == "compact":
        spark = _spark()
        if args.max_delete_files is not None \
                or args.max_deleted_ratio is not None:
            from .storage.iceberg_write import (compaction_stats,
                                                maybe_compact_iceberg)
            stats = compaction_stats(args.path)
            kw = {}
            if args.max_delete_files is not None:
                kw["max_delete_files"] = args.max_delete_files
            if args.max_deleted_ratio is not None:
                kw["max_deleted_ratio"] = args.max_deleted_ratio
            sid = maybe_compact_iceberg(spark, args.path, **kw)
            print(json.dumps({"replace_snapshot_id": sid,
                              "compacted": sid is not None,
                              "stats_before": stats}))
        else:
            sid = compact_iceberg(
                spark, args.path,
                zorder_by=args.zorder_by.split(",")
                if args.zorder_by else None,
                incremental=args.incremental)
            print(json.dumps({"replace_snapshot_id": sid}))
    elif args.action == "delete":
        if not args.where:
            print("delete requires --where col<op>value", flush=True)
            return 2
        n = delete_iceberg(_spark(), args.path,
                           _iceberg_preds(args.where),
                           equality=args.equality)
        if args.equality:
            # blind write: n is the count of STAGED delete rows, not
            # rows removed (no scan happens) — keyed differently so
            # JSON consumers can't misread it as a row count
            print(json.dumps({"deleted_rows": None,
                              "delete_rows_staged": n,
                              "equality": True}))
        else:
            print(json.dumps({"deleted_rows": n,
                              "equality": False}))
    elif args.action == "update":
        if not args.set:
            print("update requires --set col=expr", flush=True)
            return 2
        sets = dict(kv.split("=", 1) for kv in args.set)
        n = update_iceberg(_spark(), args.path, sets,
                           _iceberg_preds(args.where) or None)
        print(json.dumps({"updated_rows": n}))
    else:
        deleted = expire_snapshots(args.path,
                                   keep_last=args.keep_last)
        print(json.dumps({"deleted_files": len(deleted)}))
    return 0


def cmd_validate(args) -> int:
    """Run a YAML-declared data-quality check set against a parquet
    table; prints the per-rule report as JSON lines and exits 1 if
    any rule fails (CI-gate semantics)."""
    from .operators.validation import validate
    from .plans.yaml_instance import MinervaInstance

    inst = MinervaInstance.load(args.instance_dir)
    sets = {c.name: c for c in inst.checks}
    if args.check not in sets:
        print(f"unknown check set {args.check!r}; "
              f"available: {sorted(sets)}", file=sys.stderr)
        return 2
    spark = _spark()
    df = spark.read.parquet(args.table)
    report = validate(df, sets[args.check].compile(spark)).collect()
    failed = False
    for r in report:
        print(json.dumps({"rule": r["rule"],
                          "n_checked": r["n_checked"],
                          "n_violations": r["n_violations"],
                          "pass": r["pass"]}))
        failed = failed or not r["pass"]
    return 1 if failed else 0


def cmd_history(args) -> int:
    """Print a snapshot table's commit history as JSON lines."""
    from .storage.snaptable import SnapTable

    for entry in SnapTable(args.path).history():
        print(json.dumps(entry, default=str))
    return 0


def cmd_restore(args) -> int:
    """Roll a snapshot table back to an earlier version (published as
    a new commit — history and time travel are preserved)."""
    from .storage.snaptable import SnapTable

    new_v = SnapTable(args.path).restore(args.version)
    print(json.dumps({"restored_to": args.version, "new_version": new_v}))
    return 0


def cmd_bench(args) -> int:
    import subprocess
    return subprocess.call([sys.executable, "bench.py"])


def cmd_list_queries(args) -> int:
    from .queries.catalog import all_queries

    for name, q in all_queries().items():
        oracle = "oracle" if q.oracle else "rows-only"
        print(f"{name}\t{oracle}\t{q.survey_id}")
    return 0


def cmd_explain(args) -> int:
    """Print the optimized/physical plan of a declared query — the
    plan-review loop (`.explain("formatted")`) as a user command."""
    from .queries.catalog import all_queries

    qs = all_queries()
    if args.query not in qs:
        print(f"unknown query {args.query!r}; see list-queries",
              file=sys.stderr)
        return 2
    df = qs[args.query].spark(_spark(), args.sf_dir)
    df.explain(mode=args.mode)
    return 0


def cmd_clone(args) -> int:
    """Zero-copy shallow clone of a snapshot table."""
    from .storage.snaptable import SnapTable, shallow_clone

    clone = shallow_clone(SnapTable(args.source), args.target,
                          version=args.version)
    m = clone.history()[-1]
    print(f"cloned {args.source} -> {args.target} ({m['op']}, "
          f"{m['n_files']} files referenced, zero copied)")
    return 0


def cmd_run(args) -> int:
    """Execute a declared query and print or persist the result —
    the ad-hoc invocation surface for the catalog."""
    from .queries.catalog import all_queries

    qs = all_queries()
    if args.query not in qs:
        print(f"unknown query {args.query!r}; see list-queries",
              file=sys.stderr)
        return 2
    df = qs[args.query].spark(_spark(), args.sf_dir)
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    else:
        df.show(args.limit, truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="minerva-spark")
    sub = p.add_subparsers(dest="command", required=True)

    s = sub.add_parser("initialize", help="load a YAML instance directory")
    s.add_argument("instance_dir")
    s.set_defaults(fn=cmd_initialize)

    s = sub.add_parser("load-data", help="harvest a file into a trend store")
    s.add_argument("--file-type", default="csv")
    s.add_argument("--path", required=True)
    s.add_argument("--target", required=True)
    s.add_argument("--delimiter", default=",")
    s.add_argument("--timestamp-column", default="timestamp")
    s.add_argument("--timestamp-format", default="yyyy-MM-dd HH:mm:ss")
    s.add_argument("--entity-expression", default="entity")
    s.add_argument("--granularity", default="1d")
    s.add_argument("--modified-log", default=None)
    s.set_defaults(fn=cmd_load_data)

    s = sub.add_parser("materialize", help="incremental materialization run")
    s.add_argument("--source", required=True)
    s.add_argument("--target", required=True)
    s.add_argument("--state", required=True)
    s.add_argument("--granularity", default="1h")
    s.add_argument("--entity-column", default="entity_key")
    s.add_argument("--timestamp-column", default="timestamp")
    s.add_argument("--sum-columns", nargs="*", default=[])
    s.set_defaults(fn=cmd_materialize)

    s = sub.add_parser("create-notifications",
                       help="evaluate a trigger, append notifications")
    s.add_argument("--instance-dir", required=True)
    s.add_argument("--trigger", required=True)
    s.add_argument("--source", required=True)
    s.add_argument("--target", required=True)
    s.add_argument("--entity-column", default="entity_key")
    s.add_argument("--timestamp-column", default="timestamp")
    s.set_defaults(fn=cmd_create_notifications)

    s = sub.add_parser("aggregate",
                       help="run a declared part aggregation "
                            "(time and/or entity relation)")
    s.add_argument("--instance-dir", required=True)
    s.add_argument("--data-source", required=True)
    s.add_argument("--part", required=True)
    s.add_argument("--source", required=True)
    s.add_argument("--target", required=True)
    s.add_argument("--target-granularity", default=None)
    s.add_argument("--relation", default=None)
    s.add_argument("--relation-table", default=None)
    s.add_argument("--entity-column", default="entity_key")
    s.add_argument("--timestamp-column", default="timestamp")
    s.set_defaults(fn=cmd_aggregate)

    s = sub.add_parser("compact",
                       help="bin-pack small files in a parquet store")
    s.add_argument("--path", required=True)
    s.add_argument("--partition-col", default=None)
    s.add_argument("--target-file-mb", type=int, default=128)
    s.set_defaults(fn=cmd_compact)

    s = sub.add_parser("delta",
                       help="Delta maintenance/DML: optimize | "
                            "vacuum | delete | update | changes | "
                            "restore | set-properties")
    s.add_argument("action",
                   choices=["optimize", "vacuum", "delete", "update",
                            "changes", "restore", "set-properties"])
    s.add_argument("--path", required=True)
    s.add_argument("--where", default=None,
                   help="SQL predicate (delete/update)")
    s.add_argument("--set", action="append", default=[],
                   help="col=expr (update) / key=value "
                        "(set-properties); repeatable")
    s.add_argument("--version", type=int, default=-1,
                   help="target version (restore)")
    s.add_argument("--retention-hours", type=float, default=168)
    s.add_argument("--force", action="store_true",
                   help="allow retention below the 168h floor")
    s.add_argument("--zorder-by", default=None,
                   help="comma-separated columns: OPTIMIZE ZORDER "
                        "(multi-dimensional Morton clustering)")
    s.add_argument("--incremental", action="store_true",
                   help="with --zorder-by: cluster only files "
                        "added since the last same-column zorder")
    s.add_argument("--start", type=int, default=0,
                   help="starting commit version (changes)")
    s.add_argument("--end", type=int, default=-1,
                   help="ending commit version (changes; -1 = latest)")
    s.add_argument("--limit", type=int, default=20)
    s.set_defaults(fn=cmd_delta)

    s = sub.add_parser("iceberg",
                       help="Iceberg ops: compact | expire | delete "
                            "| update")
    s.add_argument("action", choices=["compact", "expire", "delete",
                                      "update"])
    s.add_argument("--path", required=True)
    s.add_argument("--keep-last", type=int, default=1)
    s.add_argument("--where", action="append", default=[],
                   help="predicate 'col<op>value' (delete/update); "
                        "repeatable, ANDed")
    s.add_argument("--set", action="append", default=[],
                   help="col=expr (update); repeatable")
    s.add_argument("--zorder-by", default=None,
                   help="comma-separated columns: clustering "
                        "rewrite (Morton curve; partitioned specs "
                        "cluster per partition value)")
    s.add_argument("--incremental", action="store_true",
                   help="with --zorder-by: cluster only files "
                        "newer than the last same-column zorder")
    s.add_argument("--equality", action="store_true",
                   help="delete: write a BLIND equality-delete row "
                        "instead of scanning for positions (all "
                        "--where ops must be '=')")
    s.add_argument("--max-delete-files", type=int, default=None,
                   help="compact: only when the live snapshot has "
                        "more delete files than this (policy mode)")
    s.add_argument("--max-deleted-ratio", type=float, default=None,
                   help="compact: only when delete-file rows / "
                        "data-file rows exceeds this (policy mode)")
    s.set_defaults(fn=cmd_iceberg)

    s = sub.add_parser("validate",
                       help="run a YAML check set against a parquet table")
    s.add_argument("--instance", dest="instance_dir", required=True)
    s.add_argument("--check", required=True)
    s.add_argument("--table", required=True)
    s.set_defaults(fn=cmd_validate)

    s = sub.add_parser("history", help="snapshot table commit history")
    s.add_argument("path")
    s.set_defaults(fn=cmd_history)

    s = sub.add_parser("restore",
                       help="roll a snapshot table back to a version")
    s.add_argument("path")
    s.add_argument("version", type=int)
    s.set_defaults(fn=cmd_restore)

    s = sub.add_parser("bench", help="run the headline benchmark")
    s.set_defaults(fn=cmd_bench)

    s = sub.add_parser("list-queries",
                       help="list the declared query catalog")
    s.set_defaults(fn=cmd_list_queries)

    s = sub.add_parser("clone",
                       help="zero-copy shallow clone of a snapshot table")
    s.add_argument("source")
    s.add_argument("target")
    s.add_argument("--version", type=int, default=None)
    s.set_defaults(fn=cmd_clone)

    s = sub.add_parser("run",
                       help="execute a declared query (print or write)")
    s.add_argument("query")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    s.add_argument("--limit", type=int, default=20)
    s.add_argument("--output", default=None,
                   help="write the full result to this parquet path")
    s.set_defaults(fn=cmd_run)

    s = sub.add_parser("explain",
                       help="print a declared query's physical plan")
    s.add_argument("query")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    s.add_argument("--mode", default="formatted",
                   choices=["simple", "extended", "formatted", "cost",
                            "codegen"])
    s.set_defaults(fn=cmd_explain)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
