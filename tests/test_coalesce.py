"""Column-level partial-image upserts (TableSpec.coalesce_partial).

Differential: engine replay == a per-key/per-column Python oracle fold,
across single-tx, incremental multi-tx, salted, redelivered, dirty
(DLQ) and schema-evolving streams.  Semantics: per column, the value of
the latest event (by (ts, lsn)) that set it, after the key's last
delete; a row is live iff some upsert follows the last delete.
"""

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_ray.config import TableSpec

COLS_V0 = ["email", "city", "score"]


def _wal_schema(extra=()):
    fields = [
        ("lsn", pa.int64()),
        ("op", pa.string()),
        ("user_id", pa.string()),
        ("ts", pa.timestamp("us")),
        ("email", pa.string()),
        ("city", pa.string()),
        ("score", pa.float64()),
    ]
    if "nick" in extra:
        fields.append(("nick", pa.string()))
    return pa.schema(fields)


def _spec() -> TableSpec:
    return TableSpec(
        name="users_partial",
        key="user_id",
        ts_col="ts",
        schema_v0=pa.schema(
            [
                ("user_id", pa.string()),
                ("ts", pa.timestamp("us")),
                ("email", pa.string()),
                ("city", pa.string()),
                ("score", pa.float64()),
            ]
        ),
        derive_text=False,
        coalesce_partial=True,
    )


def gen_events(n, n_users, seed, lsn0=1, cols=COLS_V0, del_rate=0.08):
    rng = random.Random(seed)
    evs = []
    for i in range(n):
        uid = f"u{rng.randrange(n_users):04d}"
        ts = 1_700_000_000_000_000 + rng.randrange(10_000) * 1_000_000
        if rng.random() < del_rate:
            evs.append(
                dict(lsn=lsn0 + i, op="delete", user_id=uid, ts=ts)
            )
            continue
        ev = dict(
            lsn=lsn0 + i,
            op=rng.choice(["insert", "update"]),
            user_id=uid,
            ts=ts,
        )
        # partial image: set a random non-empty subset of columns
        subset = [c for c in cols if rng.random() < 0.5] or [rng.choice(cols)]
        for c in subset:
            ev[c] = (
                rng.uniform(0, 100)
                if c == "score"
                else f"{c}-{rng.randrange(50)}"
            )
        evs.append(ev)
    return evs


def write_segments(evs, wal_dir, n_segments, cols=COLS_V0, extra=(), prefix="seg"):
    os.makedirs(wal_dir, exist_ok=True)
    schema = _wal_schema(extra)
    per = (len(evs) + n_segments - 1) // n_segments
    paths = []
    for s in range(n_segments):
        part = evs[s * per : (s + 1) * per]
        if not part:
            continue
        arrs = {}
        for f in schema:
            vals = [e.get(f.name) for e in part]
            arrs[f.name] = pa.array(vals, f.type)
        p = os.path.join(wal_dir, f"{prefix}-{s:05d}.parquet")
        pq.write_table(pa.table(arrs, schema=schema), p)
        paths.append(p)
    return paths


def oracle_fold(evs, cols):
    """Per-key per-column latest-non-null-after-last-delete."""
    by_key: dict[str, list] = {}
    for e in evs:
        by_key.setdefault(e["user_id"], []).append(e)
    rows = []
    for uid, kevs in by_key.items():
        kevs = sorted(kevs, key=lambda e: (e["ts"], e["lsn"]))
        del_pos = max(
            ((e["ts"], e["lsn"]) for e in kevs if e["op"] == "delete"),
            default=(-1, -1),
        )
        ups = [
            e
            for e in kevs
            if e["op"] != "delete" and (e["ts"], e["lsn"]) > del_pos
        ]
        if not ups:
            continue
        row = {"user_id": uid, "ts": ups[-1]["ts"]}
        for c in cols:
            row[c] = next(
                (e[c] for e in reversed(ups) if e.get(c) is not None), None
            )
        rows.append(row)
    return sorted(rows, key=lambda r: r["user_id"])


def engine_rows(root, cols):
    from etl_ray.pipelines.replay import read_table

    rows = read_table(root, key="user_id", ts_col="ts").take_all()
    out = []
    for r in sorted(rows, key=lambda r: r["user_id"]):
        rec = {"user_id": r["user_id"], "ts": r["ts"]}
        for c in cols:
            rec[c] = r.get(c)
        out.append(rec)
    return out


def _norm(rows, cols):
    out = []
    for r in rows:
        rec = dict(r)
        ts = rec["ts"]
        if hasattr(ts, "timestamp"):
            import calendar

            rec["ts"] = (
                calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond
            )
        if rec.get("score") is not None:
            rec["score"] = round(rec["score"], 9)
        out.append(rec)
    return out


def assert_equal(engine, oracle, cols):
    engine, oracle = _norm(engine, cols), _norm(oracle, cols)
    assert len(engine) == len(oracle)
    for a, b in zip(engine, oracle):
        assert a == b, f"{a}\n!=\n{b}"


@pytest.mark.parametrize("seed,salting", [(1, "auto"), (2, "on")])
def test_coalesce_matches_oracle(ray_session, tmp_path, seed, salting):
    from etl_ray.pipelines.replay import bootstrap_lake, replay

    evs = gen_events(3000, 150, seed)
    wal = str(tmp_path / "wal")
    write_segments(evs, wal, 6)
    root = str(tmp_path / "lake" / "users_partial")
    spec = _spec()
    bootstrap_lake(root, None, num_partitions=8, schema=spec.schema_v0)
    stats = replay(root, wal, spec=spec, salting=salting, salt=4)
    assert stats.events_applied == 3000
    assert_equal(
        engine_rows(root, COLS_V0), oracle_fold(evs, COLS_V0), COLS_V0
    )
    # idempotent
    assert replay(root, wal, spec=spec).transactions == 0


def test_coalesce_incremental_and_redelivery(ray_session, tmp_path):
    """Per-segment txs + full re-replay reach the one-shot state: late
    partial images across tx boundaries must coalesce, not clobber."""
    from etl_ray.pipelines.replay import bootstrap_lake, replay

    evs = gen_events(2000, 80, 7)
    wal = str(tmp_path / "walinc")
    write_segments(evs, wal, 8)
    root = str(tmp_path / "lake" / "up_inc")
    spec = _spec()
    bootstrap_lake(root, None, num_partitions=8, schema=spec.schema_v0)
    stats = replay(root, wal, spec=spec, max_segments_per_tx=2)
    assert stats.transactions == 4
    assert_equal(
        engine_rows(root, COLS_V0), oracle_fold(evs, COLS_V0), COLS_V0
    )
    assert replay(root, wal, spec=spec).transactions == 0  # exactly-once


def test_coalesce_schema_evolution(ray_session, tmp_path):
    """A later segment adds a column; earlier rows serve null for it and
    partial images before/after the evolution coalesce per column."""
    from etl_ray.pipelines.replay import bootstrap_lake, replay

    evs1 = gen_events(800, 60, 11)
    evs2 = gen_events(800, 60, 12, lsn0=2001, cols=COLS_V0 + ["nick"])
    wal = str(tmp_path / "walevo")
    write_segments(evs1, wal, 3)
    # second batch written with the nick column
    write_segments(
        evs2, str(tmp_path / "walevo2"), 3, extra=("nick",)
    )
    for f in os.listdir(str(tmp_path / "walevo2")):
        os.rename(
            os.path.join(str(tmp_path / "walevo2"), f),
            os.path.join(wal, "z" + f),
        )
    root = str(tmp_path / "lake" / "up_evo")
    spec = _spec()
    bootstrap_lake(root, None, num_partitions=8, schema=spec.schema_v0)
    s1 = replay(root, wal, spec=spec)
    assert s1.schema_version == 1  # nick added
    cols = COLS_V0 + ["nick"]
    assert_equal(
        engine_rows(root, cols), oracle_fold(evs1 + evs2, cols), cols
    )


def test_coalesce_dlq(ray_session, tmp_path):
    """Malformed rows quarantine; the rest coalesce as if clean."""
    from etl_ray.pipelines.replay import bootstrap_lake, read_dlq, replay

    evs = gen_events(500, 40, 21)
    dirty = list(evs)
    dirty.insert(100, dict(lsn=90001, op="update", user_id=None, ts=1))
    dirty.insert(200, dict(lsn=90002, op="frob", user_id="u0001", ts=2))
    wal = str(tmp_path / "waldirty")
    write_segments(dirty, wal, 4)
    root = str(tmp_path / "lake" / "up_dlq")
    spec = _spec()
    bootstrap_lake(root, None, num_partitions=8, schema=spec.schema_v0)
    replay(root, wal, spec=spec)
    dlq = read_dlq(root)
    assert dlq.num_rows == 2
    assert sorted(dlq["reason"].to_pylist()) == ["bad_op", "null_key"]
    assert not any(c.startswith("_cts__") for c in dlq.column_names)
    assert_equal(
        engine_rows(root, COLS_V0), oracle_fold(evs, COLS_V0), COLS_V0
    )


def test_coalesce_guards(ray_session, tmp_path):
    from dataclasses import replace

    from etl_ray.pipelines.replay import bootstrap_lake, replay

    spec = _spec()
    root = str(tmp_path / "lake" / "up_guard")
    bootstrap_lake(root, None, num_partitions=4, schema=spec.schema_v0)
    wal = str(tmp_path / "walg")
    write_segments(gen_events(10, 5, 3), wal, 1)
    with pytest.raises(NotImplementedError):
        replay(root, wal, spec=replace(spec, derive_text=True))


def test_coalesce_delta_mode(ray_session, tmp_path):
    """Merge-on-read deltas for partial-image tables: per-tx folded state
    rows append to the chain; readers fold base ∪ chain (the coalesce
    fold is associative) — final state identical to rewrite mode and the
    oracle; compact_deltas folds the chain back losslessly."""
    from etl_ray.pipelines.maintenance import compact_deltas
    from etl_ray.pipelines.replay import bootstrap_lake, replay
    from etl_ray.state.manifest import LakeTable

    evs = gen_events(2400, 100, 31)
    wal = str(tmp_path / "wald")
    write_segments(evs, wal, 8)
    spec = _spec()

    root_d = str(tmp_path / "lake" / "up_delta")
    bootstrap_lake(root_d, None, num_partitions=8, schema=spec.schema_v0)
    stats = replay(
        root_d, wal, spec=spec, merge_mode="delta", max_segments_per_tx=2
    )
    assert stats.transactions == 4
    m = LakeTable(root_d).read_manifest()
    assert any(p.get("deltas") for p in m["partitions"].values())
    oracle = oracle_fold(evs, COLS_V0)
    assert_equal(engine_rows(root_d, COLS_V0), oracle, COLS_V0)

    # rewrite mode reaches the identical state
    root_r = str(tmp_path / "lake" / "up_rewrite")
    bootstrap_lake(root_r, None, num_partitions=8, schema=spec.schema_v0)
    replay(root_r, wal, spec=spec, max_segments_per_tx=2)
    assert engine_rows(root_r, COLS_V0) == engine_rows(root_d, COLS_V0)

    # folding the chains preserves state (and the folded base keeps the
    # per-column metadata, so later partial images still coalesce)
    compact_deltas(root_d, key="user_id", ts_col="ts")
    m2 = LakeTable(root_d).read_manifest()
    assert not any(p.get("deltas") for p in m2["partitions"].values())
    assert_equal(engine_rows(root_d, COLS_V0), oracle, COLS_V0)

    # late partial images applied AFTER the fold still coalesce column-wise
    late = gen_events(400, 100, 32, lsn0=100_001)
    wal2 = str(tmp_path / "wald2")
    write_segments(late, wal2, 2, prefix="late")
    replay(root_d, wal2, spec=spec, merge_mode="delta")
    assert_equal(
        engine_rows(root_d, COLS_V0), oracle_fold(evs + late, COLS_V0), COLS_V0
    )


def test_coalesce_refuses_notnull_constraint(ray_session, tmp_path):
    """Partial-image updates legitimately carry nulls for unchanged
    columns, so a notnull gate would quarantine every partial update —
    set_constraint refuses it on coalesce tables (other ops are fine:
    CHECK semantics already pass nulls)."""
    from etl_ray.pipelines.maintenance import list_constraints, set_constraint
    from etl_ray.pipelines.replay import bootstrap_lake, replay

    spec = _spec()
    root = str(tmp_path / "lake" / "up_ct")
    bootstrap_lake(root, None, num_partitions=4, schema=spec.schema_v0)
    wal = str(tmp_path / "walct")
    write_segments(gen_events(200, 20, 7), wal, 2)
    replay(root, wal, spec=spec)

    with pytest.raises(NotImplementedError, match="coalesce"):
        set_constraint(root, "email_req", "email", "notnull", None,
                       key="user_id", ts_col="ts")
    # value predicates still work: nulls pass CHECK by definition
    set_constraint(root, "score_pos", "score", "ge", -1e9,
                   key="user_id", ts_col="ts")
    assert "score_pos" in list_constraints(root)
