"""CLI entrypoints — the `ray job submit` surface.

Usage (single node; on a cluster submit via
``ray job submit --working-dir . -- python -m etl_ray.pipelines.cli replay ...``):

    python -m etl_ray.pipelines.cli gen --out /tmp/cdc --urls 1000 --events 5000
    python -m etl_ray.pipelines.cli bootstrap --lake /tmp/lake/pages \\
        --base /tmp/cdc/base/pages.parquet --partitions 64
    python -m etl_ray.pipelines.cli replay --lake /tmp/lake/pages --wal /tmp/cdc/wal
    python -m etl_ray.pipelines.cli show --lake /tmp/lake/pages

Replaces the reference's ``python -m pipeline.app`` + spark-submit loop
(`src/pipeline/app.py:35-46`, `src/pipeline/core/spark_job.py:66-101` in
/root/reference).  The replay command is resumable: rerunning it applies
only pending segments (manifest ledger diff).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _parse_where(where: list[str]) -> list[tuple]:
    """--where col:op:value conjuncts; value coerced int -> float -> str."""
    filters = []
    for w in where:
        col, op, raw = w.split(":", 2)
        for cast in (int, float):
            try:
                raw = cast(raw)
                break
            except ValueError:
                continue
        filters.append((col, op, raw))
    return filters


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate deterministic base+WAL dataset")
    g.add_argument("--out", required=True)
    g.add_argument("--urls", type=int, default=1000)
    g.add_argument("--events", type=int, default=5000)
    g.add_argument("--segments", type=int, default=8)
    g.add_argument("--seed", type=int, default=42)

    b = sub.add_parser("bootstrap", help="create lake table (+ load base)")
    b.add_argument("--lake", required=True)
    b.add_argument("--base")
    b.add_argument("--partitions", type=int, default=64)

    r = sub.add_parser("replay", help="replay pending WAL segments (resumable)")
    r.add_argument("--lake", required=True)
    r.add_argument("--wal", required=True)
    r.add_argument("--max-segments-per-tx", type=int, default=None)
    r.add_argument("--salting", choices=["auto", "on", "off"], default="auto")
    r.add_argument("--salt", type=int, default=8)
    r.add_argument("--batch-size", type=int, default=32768)
    r.add_argument(
        "--merge-mode", choices=["rewrite", "delta"], default="rewrite",
        help="delta = merge-on-read: stage only each tx's change rows "
        "(O(changes) writes; fold chains with compact-deltas)",
    )
    r.add_argument("--follow", action="store_true", help="poll for new segments")
    r.add_argument(
        "--fold-chain-over", type=int, default=None,
        help="with --follow --merge-mode delta: auto-fold any partition "
        "whose delta chain exceeds N files after an applying poll",
    )
    r.add_argument("--poll-interval", type=float, default=5.0)
    r.add_argument("--metrics-path", default=None,
                   help="with --follow: append one JSON metrics record "
                        "per poll (events/s, lag, chain lengths, DLQ)")
    r.add_argument("--idle-exit-after", type=int, default=None,
                   help="exit after N idle polls (default: run forever)")

    s = sub.add_parser("show", help="print manifest summary + row count")
    s.add_argument("--lake", required=True)

    c = sub.add_parser("compact", help="drop tombstones <= watermark, then vacuum orphans")
    c.add_argument("--lake", required=True)
    c.add_argument("--watermark-lsn", type=int, default=None)
    c.add_argument(
        "--lateness-us", type=int, default=None,
        help="bounded-lateness contract: drop tombstones with event time "
        "<= max applied event time minus this (exact under the contract)",
    )
    c.add_argument(
        "--assume-caught-up",
        action="store_true",
        help="WAL has ended: derive the watermark from the gap-free applied "
        "prefix (default drops nothing unless --watermark-lsn is given)",
    )

    cd = sub.add_parser(
        "compact-deltas",
        help="fold merge-on-read delta chains into base part files, then vacuum",
    )
    cd.add_argument("--lake", required=True)
    cd.add_argument(
        "--min-chain", type=int, default=1,
        help="only fold partitions with at least this many deltas",
    )

    dw = sub.add_parser(
        "delete-where",
        help="GDPR-style predicate delete: payload-null matching rows in one "
        "manifest tx, footer-stats pruning skips unaffected partitions "
        "(full forget = delete-where + compact + vacuum)",
    )
    dw.add_argument("--lake", required=True)
    dw.add_argument("--column", required=True)
    dw.add_argument("--op", required=True,
                    choices=["eq", "prefix", "in", "lt", "le", "gt", "ge"])
    dw.add_argument(
        "--value", action="append", required=True,
        help="predicate value (repeat for --op in)",
    )
    dw.add_argument(
        "--value-type", default="str", choices=["str", "int", "float", "ts-us"],
        help="coerce the value(s): ts-us = integer microseconds since epoch",
    )
    dw.add_argument("--key", default="url")
    dw.add_argument("--ts-col", default="warc_ts")

    rp = sub.add_parser("repartition", help="re-bucket the table to a new partition count")
    rp.add_argument("--lake", required=True)
    rp.add_argument("--num-partitions", type=int, required=True)

    rg = sub.add_parser(
        "replay-group",
        help="replay N table streams and publish ONE atomic cross-table "
        "snapshot pointer (pipelines/groups.py)",
    )
    rg.add_argument("--group", required=True, help="group pointer directory")
    rg.add_argument(
        "--stream",
        action="append",
        required=True,
        metavar="NAME=LAKE:WAL",
        help="repeatable member spec, e.g. --stream pages=/lake/pages:/wal/pages",
    )

    zo = sub.add_parser(
        "zorder",
        help="rewrite part files in Morton (Z-curve) order over the given "
        "columns for multi-column row-group pruning (state-preserving)",
    )
    zo.add_argument("--lake", required=True)
    zo.add_argument("--by", required=True,
                    help="comma-separated 1-3 columns, e.g. warc_ts,lang")
    zo.add_argument("--key", default="url")
    zo.add_argument("--ts-col", default="warc_ts")
    zo.add_argument("--row-group-size", type=int, default=1 << 14)

    st = sub.add_parser("stats", help="operational metrics: per-tx lineage + throughput")
    st.add_argument("--lake", required=True)

    vb = sub.add_parser("view-refresh", help="build or incrementally refresh the "
                        "per-host stats view (delta-based, no table rescan)")
    vb.add_argument("--lake", required=True)
    vb.add_argument("--view", required=True, help="view directory")

    fk = sub.add_parser(
        "fsck", help="integrity audit: recompute per-file live row counts "
        "and checksums, compare to committed lineage"
    )
    fk.add_argument("--lake", required=True)
    fk.add_argument("--at-txid", default=None, help="audit a historical snapshot")

    dq = sub.add_parser(
        "dlq", help="quarantined (malformed) change events: per-reason "
        "summary from the committed dead-letter area"
    )
    dq.add_argument("--lake", required=True)
    dq.add_argument("--limit", type=int, default=0,
                    help="also print up to N quarantined rows (lsn, reason, url)")

    xp = sub.add_parser(
        "explain", help="dry-run the manifest-stats scan plan for a "
        "filtered read: partitions/files/rows skipped, no data I/O"
    )
    xp.add_argument("--lake", required=True)
    xp.add_argument(
        "--where", action="append", required=True,
        help="repeatable filter conjunct col:op:value "
             "(op in == != < <= > >= ; timestamps as epoch microseconds)",
    )
    xp.add_argument("--at-txid", default=None, help="time-travel snapshot")

    mt = sub.add_parser(
        "maintain", help="policy-driven maintenance loop: fold long delta "
        "chains, compact tombstones (only under an explicit safety flag), "
        "vacuum orphans; --dry-run reports recommendations only"
    )
    mt.add_argument("--lake", required=True)
    mt.add_argument("--max-chain", type=int, default=3)
    mt.add_argument("--tombstone-ratio", type=float, default=0.2)
    mt.add_argument("--assume-caught-up", action="store_true",
                    help="caller asserts the WAL has ended: enables "
                         "tombstone GC (gap-free prefix rule)")
    mt.add_argument("--lateness-us", type=int, default=None,
                    help="bounded-lateness contract for tombstone GC while "
                         "still tailing")
    mt.add_argument("--no-vacuum", action="store_true")
    mt.add_argument("--dry-run", action="store_true")

    xs = sub.add_parser(
        "expire", help="snapshot retention: keep the head, the last N, "
        "anything newer than a cutoff, and tagged snapshots; vacuum the rest"
    )
    xs.add_argument("--lake", required=True)
    xs.add_argument("--keep-last", type=int, default=2)
    xs.add_argument("--keep-after-us", type=int, default=None,
                    help="absolute epoch-µs cutoff: snapshots committed at or "
                         "after it are kept")

    cn = sub.add_parser(
        "count", help="exact live-row count; metadata-only where column "
        "stats decide, scanning only boundary partitions"
    )
    cn.add_argument("--lake", required=True)
    cn.add_argument(
        "--where", action="append", default=None,
        help="optional repeatable filter conjunct col:op:value",
    )
    cn.add_argument("--at-txid", default=None, help="time-travel snapshot")

    rn2 = sub.add_parser(
        "range", help="exact live min/max of one column; metadata-only "
        "for numeric/timestamp columns on flat lakes"
    )
    rn2.add_argument("--lake", required=True)
    rn2.add_argument("--column", required=True)
    rn2.add_argument("--at-txid", default=None, help="time-travel snapshot")

    hd = sub.add_parser(
        "head", help="preview N live rows; on flat lakes only the minimal "
        "partition prefix covering N is ever opened"
    )
    hd.add_argument("--lake", required=True)
    hd.add_argument("--n", type=int, default=10)
    hd.add_argument("--columns", default=None,
                    help="comma-separated column projection")
    hd.add_argument("--where", action="append", default=None,
                    help="repeatable filter conjunct col:op:value")

    gt = sub.add_parser(
        "get", help="point lookup: freshest live row(s) for url key(s), "
        "reading only the partitions they hash to"
    )
    gt.add_argument("--lake", required=True)
    gt.add_argument("--url", action="append", required=True,
                    help="repeatable: one or more keys to look up")
    gt.add_argument("--at-txid", default=None, help="time-travel snapshot")
    gt.add_argument("--at-ts", default=None, type=int,
                    help="time-travel by wall clock (epoch microseconds)")

    ex = sub.add_parser("export", help="write live rows to partitioned parquet")
    ex.add_argument("--lake", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--at-txid", default=None, help="time-travel snapshot")
    ex.add_argument("--at-ts", default=None, type=int,
                    help="time-travel by wall clock (epoch microseconds)")
    ex.add_argument("--columns", default=None,
                    help="comma-separated column projection (pruned at the scan)")
    ex.add_argument("--resumable", action="store_true",
                    help="one dir per lake partition with atomic per-partition "
                         "publish; a re-run skips finished partitions")
    ex.add_argument("--fmt", choices=("parquet", "jsonl"), default="parquet",
                    help="shard format for --resumable exports (jsonl = "
                         "newline-delimited JSON for training loaders)")
    ex.add_argument("--where", action="append", default=None,
                    help="repeatable filter conjunct col:op:value; stats-"
                         "pruned partitions are never read, and filtered "
                         "shards carry a filter-identity name tag")

    tg = sub.add_parser(
        "tag", help="named snapshot tags (lake refs): pin a committed txid "
        "under a name; vacuum protects tagged snapshots automatically"
    )
    tg.add_argument("--lake", required=True)
    tg.add_argument("--create", metavar="NAME", default=None,
                    help="pin NAME to --txid (default: current head)")
    tg.add_argument("--txid", default=None)
    tg.add_argument("--replace", action="store_true",
                    help="allow moving an existing tag")
    tg.add_argument("--delete", metavar="NAME", default=None,
                    help="drop NAME (its files become vacuum-reclaimable)")
    tg.add_argument("--list", action="store_true", dest="list_tags")

    ct = sub.add_parser(
        "constraint",
        help="declarative CHECK constraints: set verifies existing rows "
        "(footer-stats-pruned) then publishes one metadata-only tx; "
        "replay quarantines violators to the DLQ with constraint:<name>",
    )
    ct.add_argument("action", choices=["set", "drop", "list"])
    ct.add_argument("--lake", required=True)
    ct.add_argument("--name", help="constraint name (set/drop)")
    ct.add_argument("--column")
    ct.add_argument("--op",
                    choices=["eq", "prefix", "in", "lt", "le", "gt", "ge",
                             "notnull"])
    ct.add_argument("--value", action="append", default=None,
                    help="predicate value (repeat for --op in; omit for notnull)")
    ct.add_argument("--value-type", default="str",
                    choices=["str", "int", "float"])
    ct.add_argument("--no-verify", action="store_true",
                    help="skip the existing-rows scan (NOT ENFORCED on "
                    "existing data)")
    ct.add_argument("--key", default="url")
    ct.add_argument("--ts-col", default="warc_ts")

    cl = sub.add_parser(
        "clone",
        help="deep-copy a committed snapshot (head or --at-txid/--at-ts) "
        "into a fresh lake carrying the exactly-once ledger, evolution "
        "metadata, and constraints — replay resumes on the clone",
    )
    cl.add_argument("--lake", required=True, help="source table root")
    cl.add_argument("--dest", required=True, help="new table root")
    cl.add_argument("--at-txid", default=None)
    cl.add_argument("--at-ts", type=int, default=None,
                    help="epoch microseconds (timestamp time travel)")

    sy = sub.add_parser(
        "sync",
        help="incrementally update a clone to the source head, copying "
        "only changed partitions (mirror semantics; refuses a diverged "
        "destination unless --force)",
    )
    sy.add_argument("--lake", required=True, help="source table root")
    sy.add_argument("--dest", required=True, help="mirror table root")
    sy.add_argument("--force", action="store_true")

    an = sub.add_parser(
        "analyze",
        help="ANALYZE TABLE: one distributed pass collects per-column "
        "row/null counts, HLL NDV, min/max, avg byte length into the "
        "manifest (metadata-only tx); `stats` and table_stats() read it",
    )
    an.add_argument("--lake", required=True)
    an.add_argument("--column", action="append", default=None,
                    help="restrict to these columns (repeatable)")
    an.add_argument("--hll-p", type=int, default=12)
    an.add_argument("--key", default="url")
    an.add_argument("--ts-col", default="warc_ts")

    rq = sub.add_parser(
        "requeue-dlq",
        help="close the quarantine loop: re-classify dead-lettered events "
        "against current rules and re-apply the now-valid ones in one tx "
        "(fix upstream / drop a constraint, then requeue)",
    )
    rq.add_argument("--lake", required=True)
    rq.add_argument(
        "--reason", action="append", default=None,
        help="only requeue rows with this DLQ reason (repeatable; "
        "default all)",
    )
    rq.add_argument("--merge-mode", default="rewrite",
                    choices=["rewrite", "delta"])

    rn = sub.add_parser(
        "rename-column",
        help="metadata-only column rename (no file rewrite); stored files "
        "keep their era's names and every read normalizes through the chain",
    )
    rn.add_argument("--lake", required=True)
    rn.add_argument("--from", dest="old", required=True)
    rn.add_argument("--to", dest="new", required=True)

    dc = sub.add_parser(
        "drop-column",
        help="metadata-only column drop (no file rewrite); dead bytes are "
        "excluded from every read and removed at the next rewrite",
    )
    dc.add_argument("--lake", required=True)
    dc.add_argument("--column", required=True)

    args = p.parse_args(argv)

    if args.cmd == "gen":
        from ..gen import WalSpec, generate_dataset

        spec = WalSpec(
            n_urls=args.urls, n_events=args.events,
            n_segments=args.segments, seed=args.seed,
        )
        paths = generate_dataset(args.out, spec)
        print(json.dumps({"base": paths["base"], "segments": len(paths["segments"])}))
        return 0

    if args.cmd == "tag":
        from .tags import create_tag, delete_tag, list_tags

        if args.create:
            tags = create_tag(args.lake, args.create, args.txid,
                              replace=args.replace)
        elif args.delete:
            tags = delete_tag(args.lake, args.delete)
        else:
            tags = list_tags(args.lake)
        print(json.dumps({"tags": tags}))
        return 0

    if args.cmd == "rename-column":
        from .maintenance import rename_column

        lin = rename_column(args.lake, args.old, args.new)
        print(json.dumps(
            {"renamed": {"from": args.old, "to": args.new}, "txid": lin["txid"]}
        ))
        return 0

    if args.cmd == "drop-column":
        from .maintenance import drop_column

        lin = drop_column(args.lake, args.column)
        print(json.dumps({"dropped": args.column, "txid": lin["txid"]}))
        return 0

    if args.cmd == "bootstrap":
        _init_ray()
        from .replay import bootstrap_lake

        bootstrap_lake(args.lake, args.base, num_partitions=args.partitions)
        print(json.dumps({"lake": args.lake, "partitions": args.partitions}))
        return 0

    if args.cmd == "replay":
        _init_ray()
        from .replay import replay

        from .replay import follow

        t0 = time.perf_counter()
        kw = dict(
            max_segments_per_tx=args.max_segments_per_tx,
            salting=args.salting,
            salt=args.salt,
            batch_size=args.batch_size,
            merge_mode=args.merge_mode,
        )
        if args.follow:
            stats = follow(
                args.lake, args.wal,
                poll_interval=args.poll_interval,
                idle_exit_after=args.idle_exit_after,
                fold_chain_over=args.fold_chain_over,
                metrics_path=args.metrics_path,
                **kw,
            )
        else:
            stats = replay(args.lake, args.wal, **kw)
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "transactions": stats.transactions,
                    "segments_applied": stats.segments_applied,
                    "events_applied": stats.events_applied,
                    "rows_live": stats.rows_live,
                    "schema_version": stats.schema_version,
                    "seconds": round(dt, 3),
                    "events_per_sec": round(stats.events_applied / dt, 1) if dt > 0 else None,
                }
            )
        )
        return 0

    if args.cmd == "compact":
        _init_ray()
        from .maintenance import compact, vacuum

        lineage = compact(
            args.lake, args.watermark_lsn,
            assume_caught_up=args.assume_caught_up,
            lateness_us=args.lateness_us,
        )
        gc = vacuum(args.lake)
        print(json.dumps({**lineage, **gc}))
        return 0

    if args.cmd == "compact-deltas":
        _init_ray()
        from .maintenance import compact_deltas, vacuum

        lineage = compact_deltas(args.lake, min_chain=args.min_chain)
        gc = vacuum(args.lake)
        print(json.dumps({**(lineage or {"partitions_folded": 0}), **gc}))
        return 0

    if args.cmd == "repartition":
        _init_ray()
        from .maintenance import repartition

        print(json.dumps(repartition(args.lake, args.num_partitions)))
        return 0

    if args.cmd == "replay-group":
        _init_ray()
        from .groups import read_group, replay_group
        from .replay import StreamSpec

        streams = {}
        for spec_str in args.stream:
            name, rest = spec_str.split("=", 1)
            lake_root, wal_dir = rest.rsplit(":", 1)
            streams[name] = StreamSpec(lake_root=lake_root, wal_dir=wal_dir)
        stats = replay_group(streams, args.group)
        rec = read_group(args.group)
        print(
            json.dumps(
                {
                    "gtxid": rec["gtxid"],
                    "members": rec["members"],
                    "events_applied": {
                        n: s.events_applied for n, s in stats.items()
                    },
                }
            )
        )
        return 0

    if args.cmd == "zorder":
        _init_ray()
        from .maintenance import zorder_rewrite

        print(
            json.dumps(
                zorder_rewrite(
                    args.lake,
                    [c.strip() for c in args.by.split(",") if c.strip()],
                    key=args.key,
                    ts_col=args.ts_col,
                    row_group_size=args.row_group_size,
                )
            )
        )
        return 0

    if args.cmd == "delete-where":
        _init_ray()
        import pyarrow as pa

        from .maintenance import delete_where

        def _coerce(v):
            if args.value_type == "int":
                return int(v)
            if args.value_type == "float":
                return float(v)
            if args.value_type == "ts-us":
                return pa.scalar(int(v), pa.timestamp("us")).as_py()
            return v

        vals = [_coerce(v) for v in args.value]
        value = vals if args.op == "in" else vals[0]
        if args.op != "in" and len(vals) != 1:
            raise SystemExit("--value may repeat only with --op in")
        lin = delete_where(
            args.lake, args.column, args.op, value,
            key=args.key, ts_col=args.ts_col,
        )
        print(json.dumps(lin if lin is not None else {"rows_purged": 0, "noop": True}))
        return 0

    if args.cmd == "clone":
        _init_ray()
        from .maintenance import clone_table

        print(json.dumps(clone_table(
            args.lake, args.dest, at_txid=args.at_txid, at_ts=args.at_ts,
        )))
        return 0

    if args.cmd == "sync":
        _init_ray()
        from .maintenance import sync_clone

        print(json.dumps(sync_clone(args.lake, args.dest, force=args.force)))
        return 0

    if args.cmd == "analyze":
        _init_ray()
        from .maintenance import analyze

        print(json.dumps(analyze(
            args.lake, args.column, key=args.key, ts_col=args.ts_col,
            p=args.hll_p,
        )))
        return 0

    if args.cmd == "requeue-dlq":
        _init_ray()
        from .replay import requeue_dlq

        res = requeue_dlq(args.lake, reasons=args.reason,
                          merge_mode=args.merge_mode)
        print(json.dumps({
            "requeued": res["requeued"],
            "kept": res["kept"],
            "transactions": res["stats"].transactions,
        }))
        return 0

    if args.cmd == "constraint":
        from .maintenance import drop_constraint, list_constraints, set_constraint

        if args.action == "list":
            print(json.dumps(list_constraints(args.lake)))
            return 0
        if not args.name:
            raise SystemExit("--name is required for set/drop")
        if args.action == "drop":
            print(json.dumps(drop_constraint(args.lake, args.name)))
            return 0
        if not args.column or not args.op:
            raise SystemExit("--column and --op are required for set")
        _init_ray()  # the verification scan fans out Ray tasks

        def _coerce(v):
            return {"int": int, "float": float}.get(args.value_type, str)(v)

        vals = [_coerce(v) for v in (args.value or [])]
        if args.op == "notnull":
            value = None
        elif args.op == "in":
            value = vals
        elif len(vals) == 1:
            value = vals[0]
        else:
            raise SystemExit("--value must appear exactly once for this --op")
        lin = set_constraint(
            args.lake, args.name, args.column, args.op, value,
            key=args.key, ts_col=args.ts_col, verify=not args.no_verify,
        )
        print(json.dumps(lin))
        return 0

    if args.cmd == "view-refresh":
        _init_ray()
        from .views import refresh_view

        print(json.dumps(refresh_view(args.view, args.lake)))
        return 0

    if args.cmd == "fsck":
        _init_ray()
        from .maintenance import fsck

        rep = fsck(args.lake, at_txid=args.at_txid)
        print(json.dumps(rep))
        return 0 if not rep["mismatches"] else 2

    if args.cmd == "explain":
        # driver-local: the plan is manifest metadata only
        from .replay import explain_scan

        print(json.dumps(explain_scan(
            args.lake, _parse_where(args.where), at_txid=args.at_txid
        )))
        return 0

    if args.cmd == "maintain":
        from .maintenance import auto_maintain

        _init_ray()
        rep = auto_maintain(
            args.lake,
            max_chain=args.max_chain,
            tombstone_ratio=args.tombstone_ratio,
            assume_caught_up=args.assume_caught_up,
            lateness_us=args.lateness_us,
            run_vacuum=not args.no_vacuum,
            dry_run=args.dry_run,
        )
        print(json.dumps(rep))
        return 0

    if args.cmd == "expire":
        from .maintenance import expire_snapshots

        print(json.dumps(expire_snapshots(
            args.lake, keep_last=args.keep_last,
            keep_committed_after_us=args.keep_after_us,
        )))
        return 0

    if args.cmd == "count":
        from .metaquery import count_rows

        _init_ray()  # boundary partitions may need a real (tiny) scan
        print(json.dumps(count_rows(
            args.lake,
            _parse_where(args.where) if args.where else None,
            at_txid=args.at_txid,
        )))
        return 0

    if args.cmd == "range":
        from .metaquery import column_range

        _init_ray()  # truncated-bound / chain partitions may need a scan
        rep = column_range(args.lake, args.column, at_txid=args.at_txid)
        for k in ("min", "max"):  # JSON null for empty/all-null columns
            if rep[k] is not None:
                rep[k] = str(rep[k])
        print(json.dumps(rep))
        return 0

    if args.cmd == "head":
        from .replay import read_table

        _init_ray()
        cols = args.columns.split(",") if args.columns else None
        rows = read_table(
            args.lake, columns=cols,
            filters=_parse_where(args.where) if args.where else None,
            limit=args.n,
        ).take_all()
        for r in rows:
            for k, v in list(r.items()):
                if isinstance(v, bytes):
                    r[k] = f"<{len(v)} bytes>"
                elif hasattr(v, "isoformat"):
                    r[k] = v.isoformat()
        print(json.dumps({"rows": rows, "n": len(rows)}))
        return 0

    if args.cmd == "get":
        # driver-local: a lookup reads O(touched partitions) files, no Ray
        from .replay import get_rows

        t = get_rows(args.lake, args.url, at_txid=args.at_txid, at_ts=args.at_ts)
        cols = [c for c in t.column_names if c != "html"]  # binary: report size only
        rec = t.select(cols).to_pylist()
        sizes = [len(b) if b is not None else None for b in t.column("html").to_pylist()] if "html" in t.column_names else []
        for i, r in enumerate(rec):
            if sizes:
                r["html_bytes"] = sizes[i]
            r["warc_ts"] = str(r["warc_ts"])
        print(json.dumps({"rows": rec, "found": len(rec), "asked": len(args.url)}))
        return 0

    if args.cmd == "export":
        _init_ray()
        import os

        from .replay import read_table

        cols = args.columns.split(",") if args.columns else None
        fexpr = _parse_where(args.where) if args.where else None
        if args.resumable:
            from .maintenance import export_partitioned

            rep = export_partitioned(
                args.lake, args.out, at_txid=args.at_txid, at_ts=args.at_ts,
                columns=cols,
                fmt=args.fmt,
                filters=fexpr,
            )
            print(json.dumps({"out": args.out, **rep}))
            return 0
        ds = read_table(
            args.lake, at_txid=args.at_txid, at_ts=args.at_ts, columns=cols,
            filters=fexpr,
        )
        # streaming partitioned-parquet sink: one file per block; consumers
        # read the directory.  Row count comes from the written files'
        # parquet footers (metadata-only; correct under merge-on-read
        # chains, where the manifest's base-row sum is just a bound).
        ds.write_parquet(args.out)
        import pyarrow.parquet as _pq

        rows = sum(
            _pq.read_metadata(os.path.join(args.out, f)).num_rows
            for f in os.listdir(args.out)
            if f.endswith(".parquet")
        )
        print(json.dumps({"out": args.out, "rows": rows}))
        return 0

    if args.cmd == "stats":
        # the metrics surface (SURVEY.md §3.4 "metrics emit"; reference
        # exposes liveness/metrics via observe_services.py): everything is
        # derived from the committed manifest, so it needs no Ray session
        from ..state.manifest import LakeTable

        m = LakeTable(args.lake).read_manifest()
        lin = m["lineage"]
        # raw WAL events per tx when recorded (pre-compaction denominator);
        # lineage events_applied counts post-combiner merge inputs
        total_events = sum(
            tx.get("wal_events") or tx.get("events_applied") or 0 for tx in lin
        )
        total_secs = sum(tx.get("seconds") or 0 for tx in lin)
        print(
            json.dumps(
                {
                    "transactions": len(lin),
                    "rows_live": sum(p["rows"] for p in m["partitions"].values()),
                    "schema_version": m["schema_version"],
                    "segments_applied": len(m["applied_segments"]),
                    "events_applied_total": total_events,
                    "replay_seconds_total": round(total_secs, 3),
                    "events_per_sec_avg": (
                        round(total_events / total_secs, 1) if total_secs else None
                    ),
                    "dlq_rows": sum(e["rows"] for e in m.get("dlq", [])),
                    # event-time high watermark across applied txs — the
                    # bounded-lateness compaction basis (compact --lateness-us)
                    "event_ts_hi_us": max(
                        (
                            int(tx["event_ts_hi_us"])
                            for tx in lin
                            if tx.get("event_ts_hi_us") is not None
                        ),
                        default=None,
                    ),
                    "per_tx": [
                        {
                            k: tx.get(k)
                            for k in (
                                "txid", "wal_events", "events_applied", "rows_total",
                                "seconds", "events_per_sec", "salted", "compaction",
                                "partitions_rewritten",
                            )
                            if k in tx
                        }
                        for tx in lin
                    ],
                }
            )
        )
        return 0

    if args.cmd == "dlq":
        from ..state.manifest import LakeTable
        from .replay import read_dlq

        m = LakeTable(args.lake).read_manifest()
        dlq = read_dlq(args.lake)
        from collections import Counter

        by_reason = dict(Counter(dlq.column("reason").to_pylist())) if dlq.num_rows else {}
        out = {
            "dlq_rows": dlq.num_rows,
            "by_reason": by_reason,
            "files": len(m.get("dlq", [])),
        }
        if args.limit and dlq.num_rows:
            cols = [c for c in ("lsn", "reason", "url") if c in dlq.column_names]
            out["rows"] = dlq.select(cols).slice(0, args.limit).to_pylist()
        print(json.dumps(out))
        return 0

    if args.cmd == "show":
        from ..state.manifest import LakeTable

        m = LakeTable(args.lake).read_manifest()
        print(
            json.dumps(
                {
                    "txid": m["txid"],
                    "num_partitions": m["num_partitions"],
                    "schema_version": m["schema_version"],
                    "schema": [f[0] for f in m["schema"]["fields"]],
                    "rows_live": sum(p["rows"] for p in m["partitions"].values()),
                    # merge-on-read state: stored delta rows are an upper
                    # bound on additional live rows until compact-deltas
                    "delta_files": sum(
                        len(p.get("deltas", [])) for p in m["partitions"].values()
                    ),
                    "delta_rows": sum(
                        d["rows"]
                        for p in m["partitions"].values()
                        for d in p.get("deltas", [])
                    ),
                    "max_chain": max(
                        (len(p.get("deltas", [])) for p in m["partitions"].values()),
                        default=0,
                    ),
                    "applied_segments": len(m["applied_segments"]),
                    "applied_lsn_ranges": m["applied_lsn_ranges"][-3:],
                }
            )
        )
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
