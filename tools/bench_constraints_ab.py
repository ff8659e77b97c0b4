"""A/B: headline replay with vs without CHECK constraints in force.

Same fixture, session, warmup, and median-of-N estimator as bench.py's
headline (fresh lake per trial, interleaved A/B/A/B to cancel drift).
Evidence for BASELINE.md: enforcement is one vectorized kernel per
constraint per batch inside the existing combiner — no extra pass or
shuffle — so the cost should be within trial noise.

Run alone (no concurrent Ray sessions):
    RAY_GRAFT_CPUS=32 GRAFT_SF_DIR=/root/testdata/sf0.1 \
        python tools/bench_constraints_ab.py
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = "/tmp"
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("BENCH_REPLAY_TRIALS", "3"))

WAL_SCALE = {
    "sf0.001": (5_000, 25_000),
    "sf0.01": (20_000, 150_000),
    "sf0.1": (2_000_000, 4_000_000),
}


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from etl_ray.gen import _LANGS, WalSpec, generate_dataset
    from etl_ray.pipelines.maintenance import set_constraint
    from etl_ray.pipelines.replay import bootstrap_lake, replay

    sf_name = os.path.basename(SF_DIR.rstrip("/"))
    n_urls, n_events = WAL_SCALE.get(sf_name, WAL_SCALE["sf0.1"])
    data_dir = os.path.join(SCRATCH, f"etlray_bench_{n_urls}_{n_events}")
    if not os.path.exists(os.path.join(data_dir, "wal")):
        generate_dataset(
            data_dir,
            WalSpec(n_urls=n_urls, n_events=n_events, n_segments=32,
                    base_frac=0.1),
            parallel=True,
        )
    for root, _, files in os.walk(data_dir):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                fh.read()

    base = os.path.join(data_dir, "base", "pages.parquet")
    wal = os.path.join(data_dir, "wal")

    def one(tag: str, constrained: bool, i: int) -> float:
        lake = os.path.join(SCRATCH, f"lake_ab_{os.getpid()}_{tag}{i}", "pages")
        bootstrap_lake(lake, base, num_partitions=max(32, NCPU))
        if constrained:
            set_constraint(lake, "lang_known", "lang", "in", list(_LANGS))
            set_constraint(lake, "url_https", "url", "prefix", "https://")
        t0 = time.perf_counter()
        replay(lake, wal)
        dt = time.perf_counter() - t0
        import shutil

        shutil.rmtree(os.path.dirname(lake), ignore_errors=True)
        return dt

    one("warmup", False, 0)  # untimed session warmup (worker pool spawn)
    a, b = [], []
    for i in range(1, TRIALS + 1):  # interleaved to cancel drift steps
        a.append(one("plain", False, i))
        b.append(one("constr", True, i))
    med_a, med_b = statistics.median(a), statistics.median(b)
    print(json.dumps({
        "metric": "constraint-enforcement overhead on headline replay",
        "sf": sf_name, "num_cpus": NCPU,
        "wal_events": n_events, "wal_urls": n_urls,
        "plain_sec": round(med_a, 3), "plain_runs": [round(x, 3) for x in a],
        "constrained_sec": round(med_b, 3),
        "constrained_runs": [round(x, 3) for x in b],
        "overhead_pct": round(100 * (med_b - med_a) / med_a, 1),
        "constraints": ["lang in <6 langs>", "url prefix https://"],
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
