"""Driver-style correctness sweep: run every ``__ray_entry__.queries()``
entry and compare rows / schema / value-hash against ``oracle_sql()``
via DuckDB — the same three checks the round harness records in
``CORRECTNESS_r{N}.json``.

Run FROM THE REPO ROOT (Ray workers import ``etl_ray`` from cwd):

    python tools/sweep_correctness.py [sf_dir] [out.json]

Defaults: sf_dir=/root/testdata/sf0.01, out=/tmp/sweep.json.  Queries
without an ``oracle_sql()`` entry are reported rows-only, mirroring the
harness.  Value hashing sorts columns by name, then rows, rounds floats
to 6 places and collapses timestamps to int64 — mismatches here are a
signal to inspect, not necessarily the harness's exact verdict.
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import traceback

# Invoked as `python tools/sweep_correctness.py`, sys.path[0] is tools/;
# __ray_entry__ and etl_ray live one level up (cwd must still be the repo
# root so Ray WORKERS can import etl_ray).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyarrow as pa
import ray

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray.data.Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _vhash(df: pd.DataFrame) -> str:
    df = _canon(df.copy())
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            df[c] = col.round(6)
        elif pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("int64")
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep.json"
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=16, include_dashboard=False,
            ignore_reinit_error=True,
        )
    import __ray_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()  # also builds /tmp fixtures (cached)
    only = os.environ.get("ETLRAY_SWEEP_ONLY")
    if only:
        names = {n.strip() for n in only.split(",") if n.strip()}
        queries = {k: v for k, v in queries.items() if k in names}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    out: dict[str, dict] = {}
    for name, fn in queries.items():
        rec: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "err": None,
        }
        out[name] = rec
        try:
            mine = _to_pandas(fn(sf_dir))
        except Exception:
            rec["err"] = "query_fail: " + traceback.format_exc(
                limit=2).replace("\n", " | ")
            print(name, "QUERY_FAIL", flush=True)
            continue
        sql = oracles.get(name)
        if sql is None:
            rec["err"] = "no_oracle"
            rec["rows"] = len(mine)
            print(name, f"rows_only={len(mine)}", flush=True)
            continue
        try:
            oracle = con.execute(sql).df()
        except Exception:
            rec["err"] = "oracle_fail: " + traceback.format_exc(
                limit=1).replace("\n", " | ")
            print(name, "ORACLE_FAIL", flush=True)
            continue
        rec["rows_match"] = len(mine) == len(oracle)
        rec["schema_match"] = sorted(map(str, mine.columns)) == sorted(
            map(str, oracle.columns))
        try:
            rec["hash_match"] = _vhash(mine) == _vhash(oracle)
        except Exception:
            rec["hash_match"] = False
            rec["err"] = "hash_fail"
        rec["mine_rows"], rec["oracle_rows"] = len(mine), len(oracle)
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        print(name, "OK" if ok else f"MISMATCH {rec}", flush=True)
    green = sum(
        1 for r in out.values()
        if r["rows_match"] and r["schema_match"] and r["hash_match"]
    )
    print(f"GREEN {green}/{len(out)}")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
