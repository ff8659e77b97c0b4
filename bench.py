"""Benchmark harness: headline CDC replay throughput + query suite.

Prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "events_per_sec": ..., "rows_live": ...}

``--scaling`` re-runs this script in fresh processes at SCALE_LO and
SCALE_HI CPUs (default 4 and 16) on the same input — the sandbox
stand-in for the north rule's N vs 4N node criterion (see BASELINE.md).
SCALE_TRIALS (default 3) PAIRS of (lo, hi) runs execute back-to-back so
the box's ~10-minute bandwidth drift cancels inside each pair's ratio;
the reported efficiency is the median per-pair ratio and every pair is
emitted.  Each fresh session runs one untimed warmup replay first
(worker-pool spawn + plasma warmup is session startup, not throughput;
ETLRAY_BENCH_WARMUP=0 disables).  Headline estimator is the MEDIAN of
timed trials; all trial values are emitted.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# scratch outside /tmp: an external cleaner wipes /tmp mid-run in this sandbox
SCRATCH = os.environ.get("ETLRAY_SCRATCH", "/root/bench_cache")
os.environ.setdefault("RAY_TMPDIR", "/root/ray_tmp")
os.makedirs(SCRATCH, exist_ok=True)
os.makedirs(os.environ["RAY_TMPDIR"], exist_ok=True)

# bench WAL scale by sf dir (urls, events); cached under /tmp across runs
WAL_SCALE = {
    "sf0.001": (5_000, 25_000),
    "sf0.01": (20_000, 150_000),
    "sf0.1": (2_000_000, 4_000_000),
}

QUERY_SUBSET = [
    "q1_pricing_summary",
    "project_cast_lineitem",
    "upsert_lww_events",
    "hourly_event_stats",
    "revenue_by_segment",
    "token_count_docs",
    "dedup_docs_exact",
    "shingle_jaccard_docs",
    "minhash_pairs_docs",
    "knn_brute_embeddings",
    "asof_join_events_orders",
    "range_join_events_sessions",
    "topk_events_per_user",
    # round-3 additions
    "tfidf_docs",
    "bigram_counts_docs",
    "chunk_docs",
    "pack_sequences_docs",
    "decontaminate_docs",
    "approx_distinct_events",
    # round-4 additions
    "weighted_sample_docs",
    "regex_extract_docs",
    "journey_concat_users",
    "mad_outliers_events",
    "multimodal_decode_real",
    # round-4 continuation additions
    "fuzzy_pairs_docs",
    "trailing_1h_sum_per_user",
    "winsorize_values_by_type",
    "topk_frequent_users",
]


def _consume(res) -> int:
    """Force execution without materializing to the driver."""
    if hasattr(res, "count"):
        return res.count()
    return len(res)


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return round(s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2, 3)


def run_bench() -> dict:
    import logging

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    if os.environ.get("ETLRAY_POLARS_SORT"):  # A/B knob for the pid shuffle sort
        ctx.use_polars_sort = True
    # Silence the one benign WARNING Ray Data logs when a task yields zero
    # output batches (tiny aggregate results leave most partitions empty;
    # the empty RefBundle carries no schema).  Every UDF in this repo
    # returns schema-typed empty tables; the schema-less bundles come from
    # Ray's own aggregate/map_groups internals, which never invoke the UDF
    # for empty input blocks.
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).setLevel(logging.ERROR)

    from etl_ray.gen import WalSpec, generate_dataset
    from etl_ray.pipelines import queries as Q
    from etl_ray.pipelines.replay import bootstrap_lake, replay

    sf_name = os.path.basename(SF_DIR.rstrip("/"))
    n_urls, n_events = WAL_SCALE.get(sf_name, WAL_SCALE["sf0.1"])
    # the scaling criterion runs both widths on the SAME input, sized so
    # the wide run isn't dominated by fixed per-run startup (~1.5-2s)
    mult = int(os.environ.get("ETLRAY_WAL_MULT", "1"))
    n_urls, n_events = n_urls * mult, n_events * mult

    # deterministic bench WAL, cached across processes/runs
    data_dir = os.path.join(SCRATCH, f"etlray_bench_{n_urls}_{n_events}")
    if not os.path.exists(os.path.join(data_dir, "wal")):
        # extraction-dominated fixture: mostly-distinct urls (Common-Crawl
        # CDC shape); parallel deterministic generation via Ray tasks
        generate_dataset(
            data_dir,
            WalSpec(n_urls=n_urls, n_events=n_events, n_segments=32, base_frac=0.1),
            parallel=True,
        )

    # warm the page cache so we measure compute+shuffle, not first disk read
    for root, _, files in os.walk(data_dir):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                fh.read()

    # headline: bootstrap excluded; timed = full WAL replay -> committed
    # lake.  MEDIAN of BENCH_REPLAY_TRIALS (default 3) fresh lakes in this
    # session: single-box wall times vary 2-3x with page-cache/object-store
    # state (see BASELINE.md); the median is robust to one outlier in
    # either direction, where best-of-N biased the headline upward
    # (round-2 advice).  All trial times are reported alongside.
    trials = int(os.environ.get("BENCH_REPLAY_TRIALS", "3"))
    # Untimed warmup replay (ETLRAY_BENCH_WARMUP=0 disables): the first
    # replay in a fresh Ray session pays worker-pool spawn + import +
    # plasma warmup (measured: trials decline monotonically 16.9 → 10.2s
    # within one session), which is session startup, not engine
    # throughput.  Warm the pool once, untimed, so every reported trial
    # — and both sides of the fresh-process scaling ratio — measures
    # steady state with the same estimator.
    if os.environ.get("ETLRAY_BENCH_WARMUP", "1") != "0":
        lake_root = os.path.join(SCRATCH, f"lake_{os.getpid()}_warmup", "pages")
        bootstrap_lake(
            lake_root,
            os.path.join(data_dir, "base", "pages.parquet"),
            num_partitions=64,
        )
        replay(lake_root, os.path.join(data_dir, "wal"))
        shutil.rmtree(os.path.dirname(lake_root), ignore_errors=True)
    runs = []
    stats = None
    for trial in range(trials):
        lake_root = os.path.join(SCRATCH, f"lake_{os.getpid()}_{trial}", "pages")
        bootstrap_lake(
            lake_root,
            os.path.join(data_dir, "base", "pages.parquet"),
            num_partitions=64,
        )
        # drain dirty-page writeback (bootstrap just wrote ~350MB; prior
        # trials/processes may have GBs in flight) so the timed window
        # measures THIS replay, not a previous write's background flush —
        # the first trial of a batch was consistently the slowest before
        os.sync()
        t0 = time.perf_counter()
        st = replay(lake_root, os.path.join(data_dir, "wal"))
        dt = time.perf_counter() - t0
        runs.append(round(dt, 3))
        if stats is None:
            stats = st
        # remove ONLY this run's lake dir, never the shared scratch root
        # with the cached WAL
        shutil.rmtree(os.path.dirname(lake_root), ignore_errors=True)
    headline = _median(runs)

    # steady-state tailing shape: BIG base lake, SMALL change stream,
    # applied as 4 incremental transactions — rewrite vs merge-on-read
    # delta.  This is the cost profile the delta path exists for: each
    # rewrite tx pays O(partition state) per touched partition (here the
    # whole 500k-row base, every tx) while delta pays O(changes); at the
    # north rule's 10^10-row lake the ratio is the difference between
    # retailing the table 4x and appending 100k rows.  Fixture cached
    # like the headline WAL.  Skip with ETLRAY_SKIP_TAILING=1.
    tailing = {}
    if not os.environ.get("ETLRAY_SKIP_TAILING"):
        t_urls, t_events = 1_000_000, 100_000
        t_dir = os.path.join(SCRATCH, f"etlray_bench_{t_urls}_{t_events}")
        if not os.path.exists(os.path.join(t_dir, "wal")):
            generate_dataset(
                t_dir,
                WalSpec(n_urls=t_urls, n_events=t_events, n_segments=16, base_frac=0.5),
                parallel=True,
            )
        for mode in ("rewrite", "delta"):
            lake_root = os.path.join(SCRATCH, f"lake_tail_{os.getpid()}_{mode}", "pages")
            bootstrap_lake(
                lake_root,
                os.path.join(t_dir, "base", "pages.parquet"),
                num_partitions=64,
            )
            t0 = time.perf_counter()
            st = replay(
                lake_root,
                os.path.join(t_dir, "wal"),
                max_segments_per_tx=4,
                merge_mode=mode,
            )
            tailing[f"{mode}_sec"] = round(time.perf_counter() - t0, 3)
            tailing[f"{mode}_tx"] = st.transactions
            shutil.rmtree(os.path.dirname(lake_root), ignore_errors=True)
        if tailing.get("delta_sec"):
            tailing["delta_speedup"] = round(
                tailing["rewrite_sec"] / tailing["delta_sec"], 2
            )

    # Per-query times use the SAME median-of-N estimator as the headline
    # (round-4 lesson: single-shot query times caught one of the box's
    # hour-scale slow windows and masqueraded as a 4x regression — the
    # headline, median-of-3, was immune in the same run).  All trial
    # values are emitted so round-over-round comparison is
    # trial-for-trial clean.
    qtimes, qtrials = {}, {}
    if not os.environ.get("ETLRAY_SKIP_QUERIES"):
        n_qt = int(os.environ.get("BENCH_QUERY_TRIALS", "3"))
        for name in QUERY_SUBSET:
            fn = getattr(Q, name)
            ts = []
            for _ in range(n_qt):
                t0 = time.perf_counter()
                _consume(fn(SF_DIR))
                ts.append(round(time.perf_counter() - t0, 3))
            qtimes[name] = _median(ts)
            qtrials[name] = ts

    result = {
        "metric": "cdc replay seconds (WAL -> committed lake), plus query suite",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_name,
        "num_cpus": NUM_CPUS,
        "wal_events": n_events,
        "wal_urls": n_urls,
        "events_per_sec": round(n_events / headline, 1),
        "rows_live": stats.rows_live,
        "replay_runs_sec": runs,
        "query_trials_sec": qtrials,
        "tailing_4tx": tailing,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run_once(ncpu: int) -> dict:
        # scaling children skip the query suite: only the replay headline
        # feeds the N-vs-4N ratio
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            ETLRAY_SKIP_QUERIES="1",
            ETLRAY_SKIP_TAILING="1",
            BENCH_REPLAY_TRIALS=os.environ.get("BENCH_REPLAY_TRIALS", "1"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # default N=4 vs 4N=16: on this single box, >16-wide execution hits the
    # shared memory-bandwidth ceiling (see BASELINE.md), which a real
    # N- vs 4N-NODE comparison would not — nodes add bandwidth linearly.
    #
    # PAIRED design (round-3 change): the box's available bandwidth
    # drifts on ~10-minute timescales (same command, fresh processes,
    # 10 min apart: 450k vs 356k ev/s at 16 CPUs, while 4-CPU runs stay
    # within ±5%).  Running all lo trials then all hi trials lets that
    # drift land entirely on one side of the ratio; instead each trial
    # pair runs lo and hi back-to-back (~90s apart, well inside a drift
    # window), the per-pair ratio cancels the window state, and the
    # reported efficiency is the MEDIAN of per-pair ratios.  Same
    # estimator on both sides; every pair's throughputs are listed.
    lo = int(os.environ.get("SCALE_LO", "4"))
    hi = int(os.environ.get("SCALE_HI", "16"))
    trials = int(os.environ.get("SCALE_TRIALS", "3"))
    pairs = []
    for _ in range(trials):
        r_lo = run_once(lo)
        r_hi = run_once(hi)
        pairs.append(
            {
                "events_per_sec_lo": r_lo["events_per_sec"],
                "events_per_sec_hi": r_hi["events_per_sec"],
                "sec_lo": r_lo["value"],
                "sec_hi": r_hi["value"],
                "efficiency": round(
                    (r_hi["events_per_sec"] / r_lo["events_per_sec"]) / (hi / lo), 3
                ),
            }
        )
    ranked = sorted(pairs, key=lambda p: p["efficiency"])
    med = ranked[len(ranked) // 2]
    return {
        "metric": (
            f"scaling efficiency (median of per-pair ratios, {lo} vs {hi} cpus, "
            "paired fresh processes)"
        ),
        "value": med["efficiency"],
        "unit": "efficiency",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": med["sec_lo"],
        "sec_hi": med["sec_hi"],
        "events_per_sec_lo": med["events_per_sec_lo"],
        "events_per_sec_hi": med["events_per_sec_hi"],
        "pairs": pairs,
        "scaling_efficiency": med["efficiency"],
        "sf": "sf0.1" if "sf0.1" in SF_DIR else os.path.basename(SF_DIR.rstrip("/")),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
