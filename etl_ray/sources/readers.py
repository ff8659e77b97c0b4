"""Format converters / readers (reference S7: CSV/JSON -> Parquet,
`src/pipeline/core/data_processing.py:17-30`) as Ray Data one-liners."""

from __future__ import annotations


def csv_to_parquet(src: str, dst_dir: str, **read_kwargs) -> int:
    import ray.data

    ds = ray.data.read_csv(src, **read_kwargs)
    ds.write_parquet(dst_dir)
    return ds.count()


def json_to_parquet(src: str, dst_dir: str, **read_kwargs) -> int:
    import ray.data

    ds = ray.data.read_json(src, **read_kwargs)
    ds.write_parquet(dst_dir)
    return ds.count()


def read_orc(paths: str | list[str]):
    """ORC files -> Dataset: one decode task per file (files are the
    parallelism unit, same contract as WAL segments — shard inputs into
    many files, not one giant one).  Ray 2.49 has no native ORC reader;
    this composes read_binary_files + a per-file pyarrow.orc decode, so
    it streams through the same block machinery as every other source."""
    import io

    import pyarrow as pa
    import pyarrow.orc as orc
    import ray.data

    raw = ray.data.read_binary_files(paths)

    def decode(batch: pa.Table) -> pa.Table:
        tables = [
            orc.ORCFile(io.BytesIO(b.as_py())).read()
            for b in batch.column("bytes")
        ]
        return pa.concat_tables(tables, promote_options="default")

    return raw.map_batches(decode, batch_format="pyarrow", batch_size=1)


def read_feather(paths: str | list[str]):
    """Feather / Arrow-IPC files -> Dataset (same per-file decode shape
    as read_orc)."""
    import io

    import pyarrow as pa
    import pyarrow.feather as feather
    import ray.data

    raw = ray.data.read_binary_files(paths)

    def decode(batch: pa.Table) -> pa.Table:
        tables = [
            feather.read_table(io.BytesIO(b.as_py()))
            for b in batch.column("bytes")
        ]
        return pa.concat_tables(tables, promote_options="default")

    return raw.map_batches(decode, batch_format="pyarrow", batch_size=1)


def orc_to_parquet(src: str | list[str], dst_dir: str) -> int:
    ds = read_orc(src)
    ds.write_parquet(dst_dir)
    return ds.count()


def feather_to_parquet(src: str | list[str], dst_dir: str) -> int:
    ds = read_feather(src)
    ds.write_parquet(dst_dir)
    return ds.count()
