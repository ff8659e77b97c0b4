"""Filesystem adapter (state/fs.py): the lake data path runs entirely
through a pyarrow.fs-backed adapter — the sandbox stand-in for an
object-store lake (reference keeps all data in MinIO,
`src/pipeline/core/minio_client.py:83-116`).  The whole suite also runs
under ETLRAY_FS=pyarrow-local; this test pins the path inside a default
run, end to end: bootstrap -> replay -> read == oracle -> compact ->
vacuum, with the adapter passed EXPLICITLY (not via env) so the
per-call plumbing is what's exercised."""

import os

from etl_ray.oracle import replay_oracle


def test_replay_on_pyarrow_fs(ray_session, small_wal, tmp_path, monkeypatch):
    from etl_ray.pipelines.maintenance import compact, vacuum
    from etl_ray.pipelines.replay import (
        bootstrap_lake,
        get_rows,
        read_table_arrow,
        replay,
    )
    from etl_ray.state.fs import PyArrowFS, resolve

    # remote maintenance tasks resolve from env; driver-side calls get
    # the adapter explicitly
    monkeypatch.setenv("ETLRAY_FS", "pyarrow-local")
    fs = PyArrowFS()
    root = str(tmp_path / "lake_pafs" / "pages")
    bootstrap_lake(root, small_wal["base"], num_partitions=8, fs=fs)
    stats = replay(root, small_wal["wal_dir"], fs=fs)
    assert stats.transactions == 1

    oracle = replay_oracle(small_wal["base"], small_wal["segments"])
    assert read_table_arrow(root, fs=fs).equals(oracle)

    # point lookup via the adapter
    k = oracle["url"][0].as_py()
    assert get_rows(root, [k], fs=fs).num_rows == 1

    # maintenance verbs (workers resolve pyarrow-local from env)
    compact(root, assume_caught_up=True)
    vacuum(root)
    assert read_table_arrow(root, fs=fs).equals(oracle)

    # idempotence through the adapter too
    assert replay(root, small_wal["wal_dir"], fs=fs).transactions == 0


def test_resolve_specs():
    from etl_ray.state.fs import OsFS, PyArrowFS, resolve

    assert isinstance(resolve("local-os"), OsFS)
    assert isinstance(resolve("pyarrow-local"), PyArrowFS)
    assert resolve("local-os").spec == "local-os"
    import pytest

    with pytest.raises(ValueError):
        resolve("s3-nonexistent")
