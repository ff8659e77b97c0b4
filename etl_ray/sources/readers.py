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
