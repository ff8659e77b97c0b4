"""TableSpec registry: the engine is generic over key/ordering columns.

A second logical table (user profile CDC, key=user_id, ts ordering, no
text derivation, custom normalize) replays through the same machinery.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from etl_ray.config import TableSpec


def _wal_schema():
    return pa.schema(
        [
            ("lsn", pa.int64()),
            ("op", pa.string()),
            ("user_id", pa.string()),
            ("ts", pa.timestamp("us")),
            ("score", pa.float64()),
            ("segment", pa.string()),
        ]
    )


def _mk_segment(path, rows):
    cols = {k: [r[k] for r in rows] for k in ("lsn", "op", "user_id", "ts", "score", "segment")}
    tbl = pa.table(
        {
            "lsn": pa.array(cols["lsn"], pa.int64()),
            "op": pa.array(cols["op"], pa.string()),
            "user_id": pa.array(cols["user_id"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
            "score": pa.array(cols["score"], pa.float64()),
            "segment": pa.array(cols["segment"], pa.string()),
        },
        schema=_wal_schema(),
    )
    pq.write_table(tbl, path)


def _users_spec() -> TableSpec:
    # nested so cloudpickle ships it by VALUE: the tests module itself is
    # not importable on Ray workers
    def _users_normalize(batch: pa.Table) -> pa.Table:
        # uppercase segment — a per-table normalize hook (§2.11)
        seg = pc.utf8_upper(batch.column("segment"))
        return batch.set_column(batch.column_names.index("segment"), "segment", seg)

    return TableSpec(
        name="users",
        key="user_id",
        ts_col="ts",
        schema_v0=pa.schema(
            [
                ("user_id", pa.string()),
                ("ts", pa.timestamp("us")),
                ("score", pa.float64()),
                ("segment", pa.string()),
            ]
        ),
        normalize=_users_normalize,
        derive_text=False,
    )


def _write_users_wal(wal) -> None:
    _mk_segment(
        str(wal / "seg-00000.parquet"),
        [
            dict(lsn=1, op="insert", user_id="u1", ts=100, score=1.0, segment="gold"),
            dict(lsn=2, op="insert", user_id="u2", ts=100, score=2.0, segment="silver"),
            dict(lsn=3, op="update", user_id="u1", ts=200, score=1.5, segment="gold"),
        ],
    )
    _mk_segment(
        str(wal / "seg-00001.parquet"),
        [
            dict(lsn=4, op="delete", user_id="u2", ts=300, score=None, segment=None),
            # late update for u1 (older ts) must NOT win
            dict(lsn=5, op="update", user_id="u1", ts=150, score=9.9, segment="bronze"),
            dict(lsn=6, op="insert", user_id="u3", ts=50, score=3.0, segment="gold"),
        ],
    )


def test_replay_custom_tablespec(ray_session, tmp_path):
    from etl_ray.pipelines.replay import bootstrap_lake, read_table, replay

    spec = _users_spec()

    wal = tmp_path / "wal"
    wal.mkdir()
    _write_users_wal(wal)

    root = str(tmp_path / "lake" / "users")
    bootstrap_lake(root, None, num_partitions=4, schema=spec.schema_v0)
    stats = replay(root, str(wal), spec=spec)
    assert stats.events_applied == 6

    rows = sorted(read_table(root).take_all(), key=lambda r: r["user_id"])
    assert [r["user_id"] for r in rows] == ["u1", "u3"]  # u2 deleted
    u1 = rows[0]
    assert u1["score"] == 1.5 and u1["segment"] == "GOLD"  # lsn3 won; normalized
    assert rows[1]["segment"] == "GOLD"

    # incremental idempotence holds for custom specs too
    stats2 = replay(root, str(wal), spec=spec)
    assert stats2.transactions == 0


def test_replay_many_concurrent_tables(ray_session, small_wal, tmp_path):
    """The reference consumes 18 topic streams simultaneously
    (`src/pipeline/core/kafka_multi_consumer.py:100-129`); replay_many is
    the Ray restatement — N independent table streams interleaving their
    transactions in ONE Ray session, each matching its own oracle."""
    from etl_ray.oracle import replay_oracle
    from etl_ray.pipelines.replay import (
        StreamSpec,
        bootstrap_lake,
        read_table,
        read_table_arrow,
        replay_many,
    )

    users_spec = _users_spec()
    users_wal = tmp_path / "users_wal"
    users_wal.mkdir()
    _write_users_wal(users_wal)

    pages_root = str(tmp_path / "lake" / "pages")
    users_root = str(tmp_path / "lake" / "users")
    bootstrap_lake(pages_root, small_wal["base"], num_partitions=8)
    bootstrap_lake(users_root, None, num_partitions=4, schema=users_spec.schema_v0)

    stats = replay_many(
        {
            "pages": StreamSpec(pages_root, small_wal["wal_dir"]),
            "users": StreamSpec(users_root, str(users_wal), spec=users_spec),
        }
    )
    assert stats["pages"].transactions == 1 and stats["users"].transactions == 1

    oracle = replay_oracle(small_wal["base"], small_wal["segments"])
    assert read_table_arrow(pages_root).equals(oracle)
    rows = sorted(read_table(users_root).take_all(), key=lambda r: r["user_id"])
    assert [r["user_id"] for r in rows] == ["u1", "u3"]
    assert rows[0]["score"] == 1.5 and rows[0]["segment"] == "GOLD"


def test_custom_tablespec_delta_mode(ray_session, tmp_path):
    """Merge-on-read is key/ts-generic: a user_id/ts table replayed in
    delta mode serves the same state through the chain-merging read
    path (read_table(key=, ts_col=)), folds via compact_deltas, and
    answers point lookups."""
    from etl_ray.pipelines.maintenance import compact_deltas
    from etl_ray.pipelines.replay import bootstrap_lake, get_rows, read_table, replay

    spec = _users_spec()
    wal = tmp_path / "wal_delta"
    wal.mkdir()
    _write_users_wal(wal)

    root = str(tmp_path / "lake" / "users_delta")
    bootstrap_lake(root, None, num_partitions=4, schema=spec.schema_v0)
    # one tx per segment -> real chains
    replay(root, str(wal), spec=spec, max_segments_per_tx=1, merge_mode="delta")

    def snapshot():
        return sorted(
            read_table(root, key="user_id", ts_col="ts").take_all(),
            key=lambda r: r["user_id"],
        )

    rows = snapshot()
    assert [r["user_id"] for r in rows] == ["u1", "u3"]  # u2 deleted
    assert rows[0]["score"] == 1.5 and rows[0]["segment"] == "GOLD"  # late ts lost

    # point lookup with custom key/ts; the deleted key must not resolve
    got = get_rows(root, ["u1", "u2"], key="user_id", ts_col="ts")
    assert got.column("user_id").to_pylist() == ["u1"]
    assert got.column("score")[0].as_py() == 1.5

    before = snapshot()
    assert compact_deltas(root, key="user_id", ts_col="ts") is not None
    assert snapshot() == before


def test_replay_many_delta_mode(ray_session, small_wal, tmp_path):
    """Two concurrent table streams both tailing in merge-on-read mode:
    per-table manifests keep their chains independent, and each lake's
    merged read matches its oracle."""
    from etl_ray.oracle import replay_oracle
    from etl_ray.pipelines.replay import (
        StreamSpec,
        bootstrap_lake,
        read_table,
        read_table_arrow,
        replay_many,
    )

    users_spec = _users_spec()
    users_wal = tmp_path / "users_wal_delta"
    users_wal.mkdir()
    _write_users_wal(users_wal)
    users_root = str(tmp_path / "lakes" / "users")
    bootstrap_lake(users_root, None, num_partitions=4, schema=users_spec.schema_v0)

    pages_root = str(tmp_path / "lakes" / "pages")
    bootstrap_lake(pages_root, small_wal["base"], num_partitions=8)

    kw = dict(merge_mode="delta", max_segments_per_tx=2)
    results = replay_many(
        {
            "pages": StreamSpec(pages_root, small_wal["wal_dir"], replay_kwargs=dict(kw)),
            "users": StreamSpec(users_root, str(users_wal), spec=users_spec, replay_kwargs=dict(kw)),
        }
    )
    assert all(s.transactions >= 1 for s in results.values())

    oracle = replay_oracle(small_wal["base"], small_wal["segments"])
    assert read_table_arrow(pages_root).equals(oracle)
    users = sorted(
        read_table(users_root, key="user_id", ts_col="ts").take_all(),
        key=lambda r: r["user_id"],
    )
    assert [r["user_id"] for r in users] == ["u1", "u3"]
    assert users[0]["score"] == 1.5


def test_composite_key_via_normalize_surrogate(ray_session, tmp_path):
    """Composite upsert keys ((tenant, user) here) work through the
    TableSpec.normalize hook: derive one surrogate key column from the
    parts and key the table on it — the documented pattern for
    multi-column CDC keys (the engine's partition/merge machinery stays
    single-key)."""
    import pyarrow.parquet as pq

    from etl_ray.pipelines.replay import bootstrap_lake, read_table, replay

    def seg(path, rows):
        pq.write_table(
            pa.table(
                {
                    "lsn": pa.array([r[0] for r in rows], pa.int64()),
                    "op": pa.array([r[1] for r in rows], pa.string()),
                    "tenant": pa.array([r[2] for r in rows], pa.string()),
                    "user": pa.array([r[3] for r in rows], pa.string()),
                    "ts": pa.array([r[4] for r in rows], pa.timestamp("us")),
                    "score": pa.array([r[5] for r in rows], pa.float64()),
                }
            ),
            path,
        )

    def normalize(batch: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            batch.column("tenant"), batch.column("user"), "\x1f"
        )
        return batch.append_column("tk", k)

    spec = TableSpec(
        name="tenant_users",
        key="tk",
        ts_col="ts",
        schema_v0=pa.schema(
            [
                ("tk", pa.string()),
                ("tenant", pa.string()),
                ("user", pa.string()),
                ("ts", pa.timestamp("us")),
                ("score", pa.float64()),
            ]
        ),
        normalize=normalize,
        derive_text=False,
    )
    wal = tmp_path / "wal_ck"
    wal.mkdir()
    seg(str(wal / "seg-00000.parquet"), [
        (1, "insert", "t1", "alice", 100, 1.0),
        (2, "insert", "t2", "alice", 100, 2.0),   # same user, other tenant
        (3, "update", "t1", "alice", 200, 1.5),
        (4, "insert", "t1", "bob", 100, 3.0),
        (5, "delete", "t2", "alice", 300, None),
    ])
    root = str(tmp_path / "lake" / "tenant_users")
    bootstrap_lake(root, None, num_partitions=4, schema=spec.schema_v0)
    replay(root, str(wal), spec=spec)
    rows = sorted(
        ((r["tenant"], r["user"], r["score"]) for r in read_table(root).take_all())
    )
    assert rows == [("t1", "alice", 1.5), ("t1", "bob", 3.0)]


def test_composite_key_null_part_quarantined(ray_session, tmp_path):
    """A null key PART yields a null surrogate key only AFTER normalize:
    the post-normalize re-check must quarantine it (reason null_key)
    instead of crashing the key hash; valid rows still apply."""
    import pyarrow.parquet as pq

    from etl_ray.pipelines.replay import bootstrap_lake, read_dlq, read_table, replay

    def seg(path, rows):
        pq.write_table(
            pa.table(
                {
                    "lsn": pa.array([r[0] for r in rows], pa.int64()),
                    "op": pa.array([r[1] for r in rows], pa.string()),
                    "tenant": pa.array([r[2] for r in rows], pa.string()),
                    "user": pa.array([r[3] for r in rows], pa.string()),
                    "ts": pa.array([r[4] for r in rows], pa.timestamp("us")),
                    "score": pa.array([r[5] for r in rows], pa.float64()),
                }
            ),
            path,
        )

    def normalize(batch: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            batch.column("tenant"), batch.column("user"), "\x1f"
        )
        return batch.append_column("tk", k)

    spec = TableSpec(
        name="tenant_users_dlq",
        key="tk",
        ts_col="ts",
        schema_v0=pa.schema(
            [
                ("tk", pa.string()),
                ("tenant", pa.string()),
                ("user", pa.string()),
                ("ts", pa.timestamp("us")),
                ("score", pa.float64()),
            ]
        ),
        normalize=normalize,
        derive_text=False,
    )
    wal = tmp_path / "wal_ckq"
    wal.mkdir()
    seg(str(wal / "seg-00000.parquet"), [
        (1, "insert", "t1", "alice", 100, 1.0),
        (2, "insert", None, "bob", 100, 2.0),     # null tenant -> null tk
        (3, "insert", "t2", "carol", 100, 3.0),
    ])
    root = str(tmp_path / "lake" / "tenant_users_dlq")
    bootstrap_lake(root, None, num_partitions=4, schema=spec.schema_v0)
    replay(root, str(wal), spec=spec)
    users = sorted(r["user"] for r in read_table(root).take_all())
    assert users == ["alice", "carol"]
    dlq = read_dlq(root)
    assert dlq.num_rows == 1
    assert dlq["reason"].to_pylist() == ["null_key"]
    assert dlq["lsn"].to_pylist() == [2]


def test_compact_custom_tablespec(ray_session, tmp_path):
    """compact(lateness_us=...) must honor a custom TableSpec's ts_col
    (round-3 advice: the by_ts rule hardcoded warc_ts and KeyError'd)."""
    from etl_ray.pipelines.maintenance import compact
    from etl_ray.pipelines.replay import bootstrap_lake, read_table, replay

    spec = _users_spec()
    wal = tmp_path / "wal_c"
    wal.mkdir()
    _write_users_wal(wal)
    root = str(tmp_path / "lake" / "users_c")
    bootstrap_lake(root, None, num_partitions=4, schema=spec.schema_v0)
    replay(root, str(wal), spec=spec)

    # u2's tombstone (ts=300) is droppable under lateness 0: watermark =
    # max applied event ts (300) - 0 = 300 >= 300
    lin = compact(root, lateness_us=0, key="user_id", ts_col="ts")
    assert lin["tombstones_dropped"] == 1
    rows = sorted(r["user_id"] for r in read_table(root).take_all())
    assert rows == ["u1", "u3"]
