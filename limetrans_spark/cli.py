"""spark-submit entry points: build / search / filter.

Mirrors the reference's two CLIs:

* ``Main.main(config.json)`` — the index-build pipeline
  (``main/src/main/java/hbz/limetrans/Main.java:111-133``) →
  ``python -m limetrans_spark.cli build ...`` (or the same file via
  ``spark-submit --py-files limetrans_spark``).
* ``filter/Main`` — standalone filter/extract
  (``main/src/main/java/hbz/limetrans/filter/Main.java:15-23``; options
  ``-f`` conditions, ``-O`` operator, ``-o`` output, ``-P`` pretty) →
  ``python -m limetrans_spark.cli filter ...``.

plus the query surface the reference delegates to Elasticsearch:
``python -m limetrans_spark.cli search --root <index> --query '...'``.

Exit code 1 on any failure (Main.java:115-132 exit-code discipline).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

from .operators import query as Q
from .operators.filter import Filter
from .plans import lifecycle as lc
from .session import get_spark


def _add_build(sub):
    p = sub.add_parser("build", help="build + publish an index snapshot")
    p.add_argument("--input", required=True, help="parquet path of the corpus table")
    p.add_argument("--root", required=True, help="index root directory")
    p.add_argument("--name", default="code")
    p.add_argument("--generation", required=True, help="snapshot generation id (e.g. 20260816)")
    p.add_argument("--text-col", default="content")
    p.add_argument(
        "--analyzer",
        default="code",
        choices=[
            "code",
            "simple",
            "simple_stem",
            "simple_stem_de",
            "simple_stop",
            "simple_stop_stem_de",
        ],
    )
    p.add_argument("--shard-size", type=int, default=1 << 17)
    p.add_argument("--buckets", type=int, default=16)
    p.add_argument("--wave-size", type=int, default=4)
    p.add_argument("--retain", type=int, default=2)


def _add_search(sub):
    p = sub.add_parser("search", help="BM25 top-k query against a published index")
    p.add_argument("--root", required=True)
    p.add_argument("--snapshot", default=None)
    p.add_argument("--query", required=True)
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--mode", default="df", choices=["df", "wand", "taat"])
    p.add_argument("--operator", default=None, choices=["and", "or"])


def _add_build_fielded(sub):
    p = sub.add_parser(
        "build-fielded",
        help="build + publish per-field index snapshots (save_fielded layout)",
    )
    p.add_argument("--input", required=True, help="parquet path of the corpus table")
    p.add_argument("--root", required=True)
    p.add_argument("--name", default="code")
    p.add_argument("--generation", required=True)
    p.add_argument(
        "--fields", required=True,
        help='JSON field map: {"field": "col"} or {"field": ["col", "analyzer"]}',
    )
    p.add_argument(
        "--copy-to", default=None,
        help='JSON copy_to map: {"source_field": ["target", ...]}',
    )
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--shard-size", type=int, default=1 << 17)
    p.add_argument("--retain", type=int, default=2)


def _add_search_fielded(sub):
    p = sub.add_parser(
        "search-fielded", help="fielded BM25 top-k (field:term query syntax)"
    )
    p.add_argument("--root", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--default-field", default="all")


def _add_serve(sub):
    p = sub.add_parser(
        "serve",
        help="Spark-FREE BM25 top-k straight from a published snapshot "
        "(pyarrow; serving replicas never start a SparkSession)",
    )
    p.add_argument("--root", required=True, help="index root (or save_fielded root)")
    p.add_argument("--snapshot", default=None, help="snapshot name (default: alias)")
    p.add_argument("--query", default=None)
    p.add_argument(
        "--get-doc", type=int, default=None, metavar="DOC_ID",
        help="getDocument point lookup instead of a search: print the "
        "document row as JSON (tombstoned/absent ids print null)",
    )
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--fielded", action="store_true", help="root is a save_fielded tree")
    p.add_argument("--default-field", default="all")
    p.add_argument(
        "--shards", default=None,
        help="comma-separated shard ids: load only this replica's slice",
    )
    p.add_argument(
        "--unordered-slop", action="store_true",
        help='Lucene-style out-of-order NEAR: "a b"~2 also matches b a '
        "(default: order-preserving slop)",
    )
    p.add_argument(
        "--segment-base", default=None,
        help="serve a delta segment: --root points at the DELTA index "
        "root, this flag at the BASE index root (publish_delta_segment "
        "layout; results are bit-identical to a full rebuild). With "
        "--fielded, both roots are save_fielded trees "
        "(publish_fielded_delta_segment layout)",
    )
    p.add_argument(
        "--segments", action="store_true",
        help="serve the WHOLE segment stack: --root points at the "
        "newest delta; the base and any intermediate segments are "
        "discovered through the segment_of links each publish recorded",
    )


def _add_filter(sub):
    p = sub.add_parser("filter", help="standalone record filter (filter/Main analogue)")
    p.add_argument("--input", required=True, help="parquet path")
    p.add_argument("-f", "--cond", action="append", default=[],
                   help="condition: @f | !f | f=v | f=~re | v | ~re (repeatable)")
    p.add_argument("-O", "--operator", default="any", choices=["all", "any", "none"])
    p.add_argument("-o", "--output", default=None, help="output dir (JSONL); stdout if omitted")
    p.add_argument("-P", "--pretty", action="store_true")
    p.add_argument("--limit", type=int, default=100, help="stdout row cap")


def _add_compact(sub):
    p = sub.add_parser(
        "compact",
        help="fold a delta-segment stack into a fresh base snapshot "
        "(compact_segments; the stack is located from the newest "
        "delta's segment_of links)",
    )
    p.add_argument("--root", required=True,
                   help="NEWEST delta index root of the stack")
    p.add_argument("--out", required=True,
                   help="output index root for the compacted base")
    p.add_argument("--name", default="code")
    p.add_argument("--generation", required=True)
    p.add_argument("--text-col", default="content")
    p.add_argument("--retain", type=int, default=2)


def _add_check(sub):
    p = sub.add_parser(
        "check",
        help="checkIndex analogue: recompute the live state's df/cf/N "
        "from the snapshot's (or segment stack's) own postings — "
        "tombstone-aware across a stack — and compare against the "
        "published statistics (check_index)",
    )
    p.add_argument("--root", required=True,
                   help="index root (plain snapshot or NEWEST delta of a stack)")
    p.add_argument("--fielded", action="store_true",
                   help="root is a save_fielded tree: check every "
                   "field's stack + the shared-tombstone invariant")
    p.add_argument("--deep", action="store_true",
                   help="also decode every compressed posting run in "
                   "the serving artifact and validate the codec "
                   "invariants (doc-id monotonicity, shard bounds, "
                   "skip pointers, positions)")


def _add_run(sub):
    p = sub.add_parser(
        "run",
        help="run a config-file pipeline (Main.main(config.json) analogue)",
    )
    p.add_argument("config", help="JSON settings file")
    p.add_argument("--env", default=None,
                   choices=["prod", "dev", "local", "ignore"],
                   help="environment overlay (Main.java Env)")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="dotted-path settings override (repeatable)")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="limetrans-spark")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)
    _add_build(sub)
    _add_search(sub)
    _add_build_fielded(sub)
    _add_search_fielded(sub)
    _add_serve(sub)
    _add_filter(sub)
    _add_compact(sub)
    _add_check(sub)
    _add_run(sub)
    args = ap.parse_args(argv)

    if args.cmd == "serve":  # no SparkSession — the serving-replica path
        import os

        from .operators.serve import LocalSearcher

        if (args.query is None) == (args.get_doc is None):
            print(json.dumps(
                {"ok": False, "error": "serve needs exactly one of --query / --get-doc"}
            ))
            return 2

        if args.fielded:
            from .operators.fielded import LocalFieldedSharded, SegmentedFielded

            if args.segments:
                repl = SegmentedFielded.from_chain(args.root)
            elif args.segment_base:
                repl = SegmentedFielded.from_snapshots(
                    args.segment_base, args.root
                )
            else:
                repl = LocalFieldedSharded.from_snapshot(args.root)
            if args.get_doc is None:
                hits = repl.search(
                    args.query, k=args.k, default_field=args.default_field,
                    unordered_slop=args.unordered_slop,
                )
        elif args.segment_base or args.segments:
            from .operators.serve import SegmentedSearcher

            def _resolve(root):
                snap = lc.current_snapshot(root)
                if snap is None:
                    raise FileNotFoundError(f"no current snapshot under {root}")
                return os.path.join(root, "snapshots", snap)

            if args.segments:
                repl = SegmentedSearcher.from_chain(_resolve(args.root))
            else:
                repl = SegmentedSearcher.from_snapshots(
                    _resolve(args.segment_base), _resolve(args.root)
                )
            if args.get_doc is None:
                hits = repl.search(
                    args.query, k=args.k, unordered_slop=args.unordered_slop
                )
        else:
            snap_name = args.snapshot or lc.current_snapshot(args.root)
            if snap_name is None:
                raise FileNotFoundError(f"no current snapshot under {args.root}")
            subset = (
                [int(s) for s in args.shards.split(",")] if args.shards else None
            )
            repl = LocalSearcher.from_snapshot(
                os.path.join(args.root, "snapshots", snap_name), shard_subset=subset
            )
            if args.get_doc is None:
                hits = repl.search(
                    args.query, k=args.k, unordered_slop=args.unordered_slop
                )
        if args.get_doc is not None:
            print(json.dumps(repl.get_document(args.get_doc), default=repr))
            return 0
        for d, s in hits:
            print(json.dumps({"doc_id": d, "score": round(s, 6)}))
        return 0

    # Only stop the session on exit if this process created it: when the
    # CLI is driven in-process (tests, notebooks) the active session is
    # borrowed and stopping it would kill the caller's SparkContext.
    borrowed = SparkSession.getActiveSession() is not None
    spark = get_spark(
        app_name=f"limetrans-{args.cmd}",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd == "run":
            from .plans.config import ConfigError, run_config

            overlay = {}
            for kv in args.set:
                key, _, value = kv.partition("=")
                overlay[key] = value
            try:
                report = run_config(
                    spark, args.config, overlay=overlay or None, env=args.env
                )
            except (ConfigError, FileNotFoundError) as e:
                print(json.dumps({"ok": False, "error": str(e)}))
                return 1
            print(json.dumps(report))
            return 0 if report.get("ok") else 1
        if args.cmd == "build":
            corpus = spark.read.parquet(args.input)
            rep = lc.build_and_publish(
                corpus, args.root, args.name, args.generation,
                text_col=args.text_col, analyzer=args.analyzer,
                shard_size=args.shard_size, n_buckets=args.buckets,
                wave_size=args.wave_size, retain=args.retain,
            )
            print(json.dumps({
                "snapshot": rep.snapshot,
                "n_docs": rep.index.n_docs,
                "avgdl": rep.index.avgdl,
                "resumed_buckets": rep.metrics["resumed_buckets"],
                "n_postings": rep.metrics["n_postings"],
            }))
        elif args.cmd == "compact":
            import os

            snap_name = lc.current_snapshot(args.root)
            if snap_name is None:
                raise FileNotFoundError(f"no current snapshot under {args.root}")
            snap = lc.compact_segments(
                spark,
                os.path.join(args.root, "snapshots", snap_name),
                args.out, args.name, args.generation,
                text_col=args.text_col, retain=args.retain,
            )
            print(json.dumps({"snapshot": snap}))
        elif args.cmd == "check":
            import os

            try:
                if args.fielded:
                    report = lc.check_fielded_segments(
                        spark, args.root, deep=args.deep
                    )
                else:
                    snap_name = lc.current_snapshot(args.root)
                    if snap_name is None:
                        raise FileNotFoundError(
                            f"no current snapshot under {args.root}"
                        )
                    report = lc.check_index(
                        spark, os.path.join(args.root, "snapshots", snap_name),
                        deep=args.deep,
                    )
            except ValueError as e:
                print(json.dumps({"ok": False, "error": str(e)}))
                return 1
            print(json.dumps(report))
        elif args.cmd == "search":
            idx = lc.load_index(spark, args.root, args.snapshot)
            if args.mode == "df":
                out = Q.bm25_topk_df(idx, args.query, k=args.k)
            else:
                out = Q.bm25_topk_sharded(
                    idx, args.query, k=args.k,
                    operator=args.operator, algorithm=args.mode,
                )
            for r in out.collect():
                print(json.dumps({"doc_id": r["doc_id"], "score": round(r["score"], 6)}))
        elif args.cmd == "build-fielded":
            from .operators import fielded as FL

            corpus = spark.read.parquet(args.input)
            fields = {
                k: (tuple(v) if isinstance(v, list) else v)
                for k, v in json.loads(args.fields).items()
            }
            copy_to = json.loads(args.copy_to) if args.copy_to else None
            sidx = FL.build_fielded_sharded(
                corpus, fields=fields, copy_to=copy_to,
                id_col=args.id_col, shard_size=args.shard_size,
            )
            paths = lc.save_fielded(
                sidx, args.root, args.name, args.generation, retain=args.retain
            )
            print(json.dumps({
                "fields": {
                    f: {"snapshot": paths[f], "n_docs": sidx[f].n_docs,
                        "analyzer": sidx[f].metrics.get("analyzer")}
                    for f in sorted(paths)
                }
            }))
        elif args.cmd == "search-fielded":
            from .operators import fielded as FL

            idxs = lc.load_fielded(spark, args.root)
            out = FL.bm25_topk_fielded_sharded(
                idxs, args.query, k=args.k, default_field=args.default_field
            )
            for r in out.collect():
                print(json.dumps({"doc_id": r["doc_id"], "score": round(r["score"], 6)}))
        elif args.cmd == "filter":
            df = spark.read.parquet(args.input)
            flt = Filter(args.operator, list(args.cond))
            out = df.filter(flt.compile(df.columns))
            if args.output:
                out.write.mode("overwrite").json(args.output)
                print(json.dumps({"written": args.output, "rows": out.count()}))
            else:
                for r in out.limit(args.limit).collect():
                    d = r.asDict(recursive=True)
                    print(json.dumps(d, indent=2 if args.pretty else None, default=str))
        return 0
    except Exception as e:  # noqa: BLE001 — CLI boundary
        print(f"error: {type(e).__name__}: {e}", file=sys.stderr)
        return 1
    finally:
        if not borrowed:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
