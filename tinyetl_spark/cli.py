"""CLI — run / transfer / preview / dry-run / init-config.

Parity with the reference entry points (/root/reference/src/main.rs:14-37,
src/cli.rs:5-72, src/transfer.rs:23-368):

    python -m tinyetl_spark.cli transfer SRC DST [--transform ...]
    python -m tinyetl_spark.cli run job.yaml
    python -m tinyetl_spark.cli ... --preview N | --dry-run
    python -m tinyetl_spark.cli init-config

The pipeline order matches the reference's documented contract
(README.md:766-771): load → validate(schema file) → defaults →
transform → transfer. ``mode: stream`` switches the target to the CDC
MERGE pipeline (the north-rule path) instead of a plain file sink.
"""

from __future__ import annotations

import argparse
import sys
import time

from tinyetl_spark.config import JobConfig, Endpoint, generate_default_config
from tinyetl_spark.session import get_spark
from tinyetl_spark.transform import TransformSpec, load_python_transform


def _transform_fn(cfg: JobConfig):
    """validate(schema) → transform stage as a df->df callable, or None.
    Shared by batch mode (applied to the source frame) and stream mode
    (applied to every micro-batch before the MERGE)."""
    stages = []
    if cfg.schema_file:
        import yaml
        from tinyetl_spark.schema import DeclaredSchema
        with open(cfg.schema_file) as f:
            ds = DeclaredSchema.from_dict(yaml.safe_load(f))
        stages.append(ds.apply)
    if cfg.transform_file:
        if cfg.transform_file.endswith(".py"):
            stages.append(load_python_transform(cfg.transform_file))
        else:
            stages.append(TransformSpec.parse_file(cfg.transform_file).apply)
    elif cfg.transform:
        # inline mode: derive/overlay only, never filters (reference
        # README.md:585)
        spec = TransformSpec.parse_inline(cfg.transform)
        spec.where = None
        stages.append(spec.apply)
    if not stages:
        return None

    def fn(df):
        for s in stages:
            df = s(df)
        return df
    return fn


def _build_raw_df(spark, cfg: JobConfig):
    from tinyetl_spark.sources.files import read_source
    # date sniffing defaults ON, matching the reference's CSV behavior of
    # trial-parsing every untyped cell (connectors/csv.rs:82-111); opt out
    # with options.date_sniff: "false" (it costs one sample pass per col).
    return read_source(spark, cfg.source.uri, options=cfg.source.options,
                       infer_schema=cfg.infer_schema,
                       date_sniff=cfg.source.options.get("date_sniff", "true") != "false")


def _build_df(spark, cfg: JobConfig, raw=None):
    df = raw if raw is not None else _build_raw_df(spark, cfg)
    fn = _transform_fn(cfg)
    return fn(df) if fn else df


def cmd_run(cfg: JobConfig) -> int:
    spark = get_spark(app_name="tinyetl-cli")
    spark.sparkContext.setLogLevel("ERROR")
    # stream mode never materializes the source as a batch frame; preview/
    # dry-run still do (they print schema + sample regardless of mode).
    df = raw = None
    if cfg.mode != "stream" or cfg.preview or cfg.dry_run:
        raw = _build_raw_df(spark, cfg)
        df = _build_df(spark, cfg, raw=raw)

    if cfg.preview:
        # the reference prints both the source schema and the
        # post-transform schema, then a fixed-width data grid
        # (transfer.rs:201-336) — rendered in the same box format
        from tinyetl_spark.render import data_grid, schema_grid
        print("source schema:")
        print(schema_grid(raw))
        print("output schema:")
        print(schema_grid(df))
        print(f"\nData Preview ({cfg.preview} rows):")
        print(data_grid(df, cfg.preview))
        return 0
    if cfg.dry_run:
        # connect both ends, resolve schema, 10-row transform smoke, zero
        # writes (reference transfer.rs:318-368)
        df.limit(10).collect()
        print("dry-run ok:")
        df.printSchema()
        print(f"would write to {cfg.target.uri} "
              f"({'stream' if cfg.mode == 'stream' else 'batch'} mode)")
        return 0

    t0 = time.time()
    if cfg.mode == "stream":
        from tinyetl_spark.lake import LakeTable
        from tinyetl_spark.schema import PAGES_SCHEMA
        from tinyetl_spark.streaming.pipeline import run_to_completion
        if not cfg.checkpoint_dir:
            raise SystemExit("stream mode requires options.checkpoint_dir")
        LakeTable.create_if_not_exists(
            spark, cfg.target.uri, PAGES_SCHEMA,
            key_col=cfg.key_col, num_buckets=cfg.num_buckets)
        stats = run_to_completion(
            spark, cfg.source.uri, cfg.target.uri, cfg.checkpoint_dir,
            max_files_per_trigger=cfg.max_files_per_trigger,
            transform_fn=_transform_fn(cfg),
            quarantine_dir=cfg.quarantine_dir,
            auto_rescale_rows_per_bucket=cfg.auto_rescale_rows_per_bucket,
            source_format=cfg.source_format)
        n = sum(s.events_in for s in stats)
        el = time.time() - t0
        print(f"applied {n} events in {len(stats)} batches, "
              f"{el:.1f}s ({n / max(el, 0.001):.0f} events/sec)")
    else:
        from tinyetl_spark.sources.files import write_sink
        n = df.count()
        write_sink(df, cfg.target.uri, options=cfg.target.options,
                   truncate=cfg.truncate)
        el = time.time() - t0
        print(f"transferred {n} rows in {el:.1f}s "
              f"({n / max(el, 0.001):.0f} rows/sec)")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tinyetl-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("init-config", help="print a starter job.yaml")

    mt = sub.add_parser("maintain", help="lake table housekeeping")
    mt.add_argument("table")
    mt.add_argument("--compact", action="store_true",
                    help="rewrite live data into a fresh file-set")
    mt.add_argument("--cluster-by-ts", action="store_true",
                    help="with --compact: sort each bucket by warc_ts so "
                         "row-group stats and file zone maps prune "
                         "time-window reads")
    mt.add_argument("--files-per-bucket", type=int, default=1,
                    help="with --compact --cluster-by-ts: split each "
                         "bucket into N time-ranged files")
    mt.add_argument("--rescale-buckets", type=int, default=None,
                    help="rewrite the table under a new bucket count "
                         "(partition-spec evolution; O(table), run "
                         "out-of-band)")
    mt.add_argument("--compact-deltas", action="store_true",
                    help="absorb merge-on-read delta files by rewriting "
                         "only the delta-touched buckets")
    mt.add_argument("--expire-keep", type=int, default=None,
                    help="expire snapshots, keeping the last N")
    mt.add_argument("--delete-where", default=None, metavar="COND",
                    help="row-level DELETE: erase live rows matching the "
                         "SQL condition (runs through the merge path — "
                         "the change feed carries the deletes)")
    mt.add_argument("--update-where", default=None, metavar="COND",
                    help="row-level UPDATE: condition for --set")
    mt.add_argument("--set", action="append", default=[],
                    metavar="COL=EXPR",
                    help="with --update-where: assignment, repeatable "
                         "(EXPR is SQL evaluated against the row)")
    mt.add_argument("--metrics", action="store_true",
                    help="print merge metrics + per-bucket lineage")

    mv = sub.add_parser("materialize",
                        help="create/refresh an incremental aggregate view "
                             "(pages + text bytes per domain) over a lake "
                             "table's change feed")
    mv.add_argument("source")
    mv.add_argument("view")

    rp = sub.add_parser("replicate",
                        help="mirror a lake table by tailing its change feed")
    rp.add_argument("source")
    rp.add_argument("target")
    rp.add_argument("--checkpoint", required=True)

    bs = sub.add_parser("bootstrap",
                        help="initial-load a lake table from a consistent "
                             "source snapshot (snapshot-then-stream: run "
                             "the CDC stream afterwards from a WAL "
                             "position at or before the snapshot cut)")
    bs.add_argument("source", help="snapshot URI (any supported source)")
    bs.add_argument("table", help="lake table path (created if absent)")
    bs.add_argument("--seq-col", default=None,
                    help="snapshot column holding the source's last "
                         "applied WAL position per row (exact LWW ties); "
                         "default stamps event_seq=0")
    bs.add_argument("--op-col", default=None,
                    help="snapshot column holding 'update'/'delete' per "
                         "row — pass it when the snapshot retains "
                         "tombstones (required for exact reconvergence "
                         "when the stream has out-of-order timestamps)")
    bs.add_argument("--no-extract", action="store_true",
                    help="snapshot already carries extracted text")
    bs.add_argument("--key-col", default="url")
    bs.add_argument("--num-buckets", type=int, default=16)

    fo = sub.add_parser("fanout",
                        help="fan one routed change log out to many lake "
                             "tables, each with its own epoch fence")
    fo.add_argument("log", help="change-event log dir (with a route col)")
    fo.add_argument("--table", action="append", required=True,
                    metavar="ROUTE=PATH",
                    help="route value -> lake table path (repeatable)")
    fo.add_argument("--checkpoint", required=True)
    fo.add_argument("--route-col", default="route")
    fo.add_argument("--unknown-route-dir", default=None,
                    help="dead-letter dir for events with no route match "
                         "(default: counted and dropped)")

    lk = sub.add_parser("lookup",
                        help="point-read one key from a lake table "
                             "(driver-side bucket pruning + key bloom)")
    lk.add_argument("table")
    lk.add_argument("key")
    lk.add_argument("--version", type=int, default=None,
                    help="read AS OF this snapshot version")

    cu = sub.add_parser("curate",
                        help="training-corpus curation funnel: quality "
                             "filter -> PII redact -> dedup -> "
                             "decontaminate -> sample")
    cu.add_argument("source", help="corpus source URI (parquet/csv/json)")
    cu.add_argument("target", help="curated-output parquet dir")
    cu.add_argument("--id-col", default="doc_id")
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--blocklist", default=None, metavar="FILE",
                    help="domain blocklist (one domain per line); drops "
                         "docs whose --url-col host is a blocked domain "
                         "or a subdomain of one")
    cu.add_argument("--url-col", default="url")
    cu.add_argument("--nfc", action="store_true",
                    help="Unicode-NFC-normalize + control-strip the "
                         "text column before filtering")
    cu.add_argument("--no-quality", action="store_true")
    cu.add_argument("--min-words", type=int, default=None)
    cu.add_argument("--redact-pii", action="store_true")
    cu.add_argument("--dedup", choices=["exact", "cluster", "off"],
                    default="exact")
    cu.add_argument("--dedup-lines", action="store_true",
                    help="CCNet/C4 global line pass before doc dedup: "
                         "every duplicated line corpus-wide keeps only "
                         "its first occurrence")
    cu.add_argument("--dedup-spans", type=int, default=None, metavar="K",
                    help="Lee-et-al exact-substring pass before doc "
                         "dedup: remove every word K-gram span that "
                         "occurs in >=2 distinct docs (all occurrences)")
    cu.add_argument("--decontaminate", default=None, metavar="BENCH_URI",
                    help="eval-set source; docs sharing any --ngram "
                         "word n-gram with it are dropped")
    cu.add_argument("--ngram", type=int, default=13)
    cu.add_argument("--max-nll", type=float, default=None,
                    help="CCNet-style LM filter: drop docs whose mean "
                         "per-token surprisal vs a corpus-trained "
                         "unigram LM exceeds this (nats); runs after "
                         "dedup, before decontamination")
    cu.add_argument("--lm-vocab-k", type=int, default=50_000,
                    help="unigram-LM vocabulary cap for --max-nll")
    cu.add_argument("--sample-rate", type=float, default=None)
    cu.add_argument("--seed", type=int, default=0)
    cu.add_argument("--no-report", action="store_true",
                    help="skip the per-stage funnel counts (one extra "
                         "job per stage)")

    runp = sub.add_parser("run", help="run a YAML job")
    runp.add_argument("config")
    runp.add_argument("--preview", type=int)
    runp.add_argument("--dry-run", action="store_true")

    tr = sub.add_parser("transfer", help="direct SRC DST transfer")
    tr.add_argument("source")
    tr.add_argument("target")
    tr.add_argument("--transform")
    tr.add_argument("--transform-file")
    tr.add_argument("--schema-file")
    tr.add_argument("--truncate", action="store_true")
    tr.add_argument("--preview", type=int)
    tr.add_argument("--dry-run", action="store_true")

    args = ap.parse_args(argv)
    if args.cmd == "bootstrap":
        from tinyetl_spark.lake import LakeTable
        from tinyetl_spark.schema import PAGES_SCHEMA
        from tinyetl_spark.sources.files import read_source
        from tinyetl_spark.streaming.pipeline import bootstrap_snapshot
        spark = get_spark(app_name="tinyetl-bootstrap")
        spark.sparkContext.setLogLevel("ERROR")
        t = LakeTable.create_if_not_exists(
            spark, args.table, PAGES_SCHEMA,
            key_col=args.key_col, num_buckets=args.num_buckets)
        snap = read_source(spark, args.source)
        stats = bootstrap_snapshot(t, snap, seq_col=args.seq_col,
                                   op_col=args.op_col,
                                   extract=not args.no_extract)
        if stats.fenced:
            print(f"bootstrap already committed (fenced) -> {args.table}")
        else:
            print(f"bootstrapped {stats.upserts} rows -> {args.table} "
                  f"(snapshot v{stats.snapshot_version}); start the "
                  "stream from a WAL position at or before the snapshot "
                  "cut to reconverge")
        return 0

    if args.cmd == "fanout":
        from tinyetl_spark.streaming.pipeline import run_fanout_pipeline
        spark = get_spark(app_name="tinyetl-fanout")
        spark.sparkContext.setLogLevel("ERROR")
        tables = {}
        for spec in args.table:
            route, _, path = spec.partition("=")
            if not path:
                raise SystemExit(f"--table wants ROUTE=PATH, got {spec!r}")
            tables[route] = path
        run = run_fanout_pipeline(
            spark, args.log, tables, args.checkpoint,
            route_col=args.route_col,
            unknown_route_dir=args.unknown_route_dir)
        run.await_termination()
        for route, stats in run.stats.items():
            applied = sum(s.events_in for s in stats if not s.fenced)
            print(f"route {route}: {applied} events in {len(stats)} "
                  f"batches -> {tables[route]}")
        if run.unrouted_events:
            where = args.unknown_route_dir or "dropped"
            print(f"unrouted events: {run.unrouted_events} ({where})")
        return 0

    if args.cmd == "curate":
        from tinyetl_spark.curate import curate_corpus
        from tinyetl_spark.sources.files import read_source
        spark = get_spark(app_name="tinyetl-curate")
        spark.sparkContext.setLogLevel("ERROR")
        corpus = read_source(spark, args.source)
        bench = (read_source(spark, args.decontaminate)
                 if args.decontaminate else None)
        qp = ({"min_words": args.min_words}
              if args.min_words is not None else None)
        blocked = None
        if args.blocklist:
            with open(args.blocklist, encoding="utf-8") as f:
                blocked = [ln.strip() for ln in f
                           if ln.strip() and not ln.startswith("#")]
        res = curate_corpus(
            corpus, text_col=args.text_col, id_col=args.id_col,
            blocklist=blocked, url_col=args.url_col, nfc=args.nfc,
            quality=not args.no_quality, quality_params=qp,
            redact_pii=args.redact_pii, dedup_lines=args.dedup_lines,
            dedup_spans=args.dedup_spans,
            dedup=args.dedup, bench=bench,
            ngram=args.ngram, lm_max_nll=args.max_nll,
            lm_vocab_k=args.lm_vocab_k, sample_rate=args.sample_rate,
            seed=args.seed)
        res.df.write.mode("overwrite").parquet(args.target)
        if not args.no_report:
            for name, n in res.funnel():
                print(f"  {name:<14} {n}")
        print(f"curated corpus -> {args.target}")
        return 0

    if args.cmd == "lookup":
        from tinyetl_spark.lake import LakeTable
        from tinyetl_spark.render import data_grid
        spark = get_spark(app_name="tinyetl-lookup")
        spark.sparkContext.setLogLevel("ERROR")
        t = LakeTable(spark, args.table)
        if not t.exists():
            raise SystemExit(f"no lake table at {args.table}")
        rows = t.lookup(args.key, version=args.version)
        n = rows.count()
        if n == 0:
            print(f"not found: {args.key}")
            return 1
        print(data_grid(rows, n))
        return 0

    if args.cmd == "replicate":
        from tinyetl_spark.lake import LakeTable
        from tinyetl_spark.streaming.pipeline import replicate
        spark = get_spark(app_name="tinyetl-replicate")
        spark.sparkContext.setLogLevel("ERROR")
        src = LakeTable(spark, args.source)
        if not src.exists():
            raise SystemExit(f"no lake table at {args.source}")
        dst = LakeTable(spark, args.target)
        if not dst.exists():
            LakeTable.create(spark, args.target, src.snapshot().schema,
                             key_col=src.snapshot().key_col,
                             num_buckets=src.snapshot().num_buckets)
        stats = replicate(spark, args.source, args.target, args.checkpoint)
        applied = sum(s.events_in for s in stats if not s.fenced)
        print(f"replicated {applied} change rows in {len(stats)} "
              f"micro-batches -> {args.target}")
        return 0

    if args.cmd == "materialize":
        from tinyetl_spark.lake import LakeTable
        from tinyetl_spark.streaming.matview import create_view, refresh_view
        spark = get_spark(app_name="tinyetl-materialize")
        spark.sparkContext.setLogLevel("ERROR")
        src = LakeTable(spark, args.source)
        if not src.exists():
            raise SystemExit(f"no lake table at {args.source}")
        view = LakeTable(spark, args.view)
        if not view.exists():
            view = create_view(spark, args.view)
        s = refresh_view(spark, src, view)
        if s is None:
            print(f"view already current at source v{src.current_version()}")
        else:
            print(f"refreshed {args.view} to source v{s.batch_id}: "
                  f"{s.upserts} group upserts, {s.deletes} deletes")
        return 0

    if args.cmd == "maintain":
        from tinyetl_spark.lake import LakeTable
        spark = get_spark(app_name="tinyetl-maintain")
        spark.sparkContext.setLogLevel("ERROR")
        t = LakeTable(spark, args.table)
        if not t.exists():
            raise SystemExit(f"no lake table at {args.table}")
        if args.compact:
            snap = t.compact(cluster_by_ts=args.cluster_by_ts,
                             files_per_bucket=args.files_per_bucket)
            print(f"compacted -> snapshot v{snap.version}, "
                  f"{len(snap.files)} files")
        if args.rescale_buckets is not None:
            snap = t.rescale_buckets(args.rescale_buckets)
            print(f"rescaled -> snapshot v{snap.version}, "
                  f"{snap.num_buckets} buckets, {len(snap.files)} files")
        if args.compact_deltas:
            snap = t.compact_deltas()
            print(f"delta-compacted -> snapshot v{snap.version}, "
                  f"{len(snap.files)} files "
                  f"({snap.summary.get('rewritten_buckets', 0)} buckets "
                  f"rewritten)")
        if args.delete_where:
            from tinyetl_spark.lake.dml import delete_where
            s = delete_where(t, args.delete_where)
            print(f"deleted {s.deletes} rows -> snapshot "
                  f"v{s.snapshot_version}")
        if args.update_where:
            from tinyetl_spark.lake.dml import update_where
            if not args.set:
                raise SystemExit("--update-where needs at least one --set")
            assignments = {}
            for spec in args.set:
                col, _, expr = spec.partition("=")
                if not expr:
                    raise SystemExit(f"--set wants COL=EXPR, got {spec!r}")
                assignments[col] = expr
            s = update_where(t, args.update_where, assignments)
            print(f"updated {s.upserts} rows -> snapshot "
                  f"v{s.snapshot_version}")
        if args.expire_keep is not None:
            print(t.expire_snapshots(keep_last=args.expire_keep))
        if args.metrics:
            from tinyetl_spark.lineage import bucket_lineage, merge_metrics
            merge_metrics(t).show(50, truncate=False)
            bucket_lineage(t).show(50)
        return 0
    if args.cmd == "init-config":
        print(generate_default_config())
        return 0
    if args.cmd == "run":
        cfg = JobConfig.from_yaml(args.config)
        cfg.preview = args.preview
        cfg.dry_run = args.dry_run
        return cmd_run(cfg)
    cfg = JobConfig(
        source=Endpoint(uri=args.source), target=Endpoint(uri=args.target),
        transform=args.transform, transform_file=args.transform_file,
        schema_file=args.schema_file, truncate=args.truncate,
        preview=args.preview, dry_run=args.dry_run)
    return cmd_run(cfg)


if __name__ == "__main__":
    sys.exit(main())
