"""Per-batch normalize operators (SURVEY.md §2.3 M1-M15) — Arrow-native.

Each function is pa.Table -> pa.Table (or a column helper), pluggable into
``Dataset.map_batches(fn, batch_format="pyarrow")``.  They re-express the
reference's per-topic Spark projections as vectorized pyarrow.compute
kernels; reference locations cited per function (all into /root/reference).
"""

from __future__ import annotations

import json
import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# M4/M5/M7/M8: rename + cast projection
# ---------------------------------------------------------------------------


def project(
    tbl: pa.Table,
    spec: list[tuple],
) -> pa.Table:
    """Select/rename/cast projection — the reference's per-topic
    ``select(col(x).cast(t).alias(y))`` (`src/pipeline/core/spark.py:108-121,
    306-318,567-578`).

    ``spec`` entries: ``(src, dst, type)`` where ``src`` is a column name,
    a dotted ``struct.field`` path, or ``("const", value)``; ``type`` is a
    pyarrow DataType or None (keep).
    """
    cols, names = [], []
    n = tbl.num_rows
    for src, dst, typ in spec:
        if isinstance(src, tuple) and src[0] == "const":
            arr = pa.array([src[1]] * n, typ)  # lit(...) (`spark.py:119,920`)
        elif isinstance(src, str) and "." in src and src not in tbl.column_names:
            head, *rest = src.split(".")
            arr = tbl.column(head)
            for f in rest:  # nested extract (`spark.py:117`)
                arr = pc.struct_field(arr, f)
        else:
            arr = tbl.column(src)
        if typ is not None and arr.type != typ:
            arr = pc.cast(arr, typ)
        cols.append(arr)
        names.append(dst)
    return pa.table(dict(zip(names, cols)))


# ---------------------------------------------------------------------------
# M3: envelope unwrap
# ---------------------------------------------------------------------------


def unwrap_envelope(tbl: pa.Table, col: str) -> pa.Table:
    """``data = data.get("block")`` for avax_metrics
    (`src/pipeline/core/kafka_multi_consumer.py:76-78`): replace the table
    with the fields of a struct column."""
    arr = tbl.column(col)
    st = arr.type
    assert pa.types.is_struct(st), f"{col} is not a struct"
    out = {f.name: pc.struct_field(arr, f.name) for f in st}
    return pa.table(out)


# ---------------------------------------------------------------------------
# M10: struct flatten / M13: struct rebuild
# ---------------------------------------------------------------------------


def flatten_struct(tbl: pa.Table, col: str, prefix: str = "") -> pa.Table:
    """``networkToken.*`` -> flat columns, drop struct
    (`src/pipeline/core/spark.py:192-198`)."""
    arr = tbl.column(col)
    out = tbl.drop_columns([col])
    for f in arr.type:
        out = out.append_column(f"{prefix}{f.name}", pc.struct_field(arr, f.name))
    return out


def rebuild_struct(tbl: pa.Table, fields: list[str], out_col: str) -> pa.Table:
    """Re-``struct()`` flattened fields (`infra/spark/spark_job.py:27-36`)."""
    arrs = [
        tbl.column(f).combine_chunks() if isinstance(tbl.column(f), pa.ChunkedArray)
        else tbl.column(f)
        for f in fields
    ]
    arrs = [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrs]
    struct = pa.StructArray.from_arrays(arrs, names=fields)
    return tbl.drop_columns(fields).append_column(out_col, struct)


# ---------------------------------------------------------------------------
# M6: array indexing
# ---------------------------------------------------------------------------


def index_list_column(
    tbl: pa.Table, col: str, n: int, name_fmt: str = "{col}{i}", drop: bool = True
) -> pa.Table:
    """``col("topics").getItem(i)`` -> topic0..topicN
    (`src/pipeline/core/spark.py:572-575`); out-of-range -> null."""
    arr = tbl.column(col)
    la = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    off = la.offsets.to_numpy(zero_copy_only=False)
    start, length = off[:-1], off[1:] - off[:-1]
    null_mask = (
        np.asarray(la.is_valid()) if la.null_count else np.ones(len(la), bool)
    )
    out = tbl
    for i in range(n):
        # Spark getItem semantics: out-of-range / null list -> null
        # (pc.list_element raises instead)
        valid = null_mask & (i < length)
        idx = np.where(valid, start + i, 0)
        taken = la.values.take(pa.array(idx))
        col_i = pc.if_else(pa.array(valid), taken, pa.scalar(None, la.values.type))
        out = out.append_column(name_fmt.format(col=col, i=i), col_i)
    return out.drop_columns([col]) if drop else out


# ---------------------------------------------------------------------------
# M11: array -> JSON string (null-safe)
# ---------------------------------------------------------------------------


def list_to_json(tbl: pa.Table, col: str) -> pa.Table:
    """``json.dumps(x) if x else "[]"`` UDF (`src/pipeline/core/spark.py:201-205`).
    Genuinely non-vectorizable (arbitrary nesting) — per-batch Python, the
    one sanctioned fallback (SURVEY.md M11)."""
    vals = tbl.column(col).to_pylist()
    out = [json.dumps(v, separators=(",", ":")) if v else "[]" for v in vals]
    return tbl.set_column(
        tbl.column_names.index(col), col, pa.array(out, pa.string())
    )


# ---------------------------------------------------------------------------
# M12: bool -> uint8
# ---------------------------------------------------------------------------


def bool_to_uint8(tbl: pa.Table, cols: list[str]) -> pa.Table:
    """``when(col==True,1).otherwise(0)`` (`src/pipeline/core/spark.py:207-209`);
    nulls -> 0 like the reference's otherwise(0)."""
    for c in cols:
        col = tbl.column(c)
        if pa.types.is_null(col.type):  # all-null JSON field inferred as null
            col = col.cast(pa.bool_())
        arr = pc.cast(pc.fill_null(col, False), pa.uint8())
        tbl = tbl.set_column(tbl.column_names.index(c), c, arr)
    return tbl


# ---------------------------------------------------------------------------
# M9: derived columns
# ---------------------------------------------------------------------------


def add_derived(tbl: pa.Table, name: str, expr) -> pa.Table:
    """Vectorized computed column (`src/pipeline/core/spark.py:302-303`);
    ``expr`` is a callable pa.Table -> Array."""
    return tbl.append_column(name, expr(tbl))


# ---------------------------------------------------------------------------
# M14: JSON envelope row (schema-evolution escape hatch)
# ---------------------------------------------------------------------------


def to_json_envelope(tbl: pa.Table, tag: str, ingestion_ts_us: int) -> pa.Table:
    """``prepare_dataframe_for_insert`` (`src/pipeline/core/data_processing.py:6-15`):
    every row -> (date_ingestion, data_row JSON-string, tag).  The timestamp
    is an explicit argument (deterministic pipelines stamp it once at the
    driver, not per worker)."""
    n = tbl.num_rows
    rows = tbl.to_pylist()
    data_row = pa.array(
        [json.dumps(r, separators=(",", ":"), default=str) for r in rows],
        pa.string(),
    )
    return pa.table(
        {
            "date_ingestion": pa.array([ingestion_ts_us] * n, pa.timestamp("us")),
            "data_row": data_row,
            "tag": pa.array([tag] * n, pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# M15: filename tag regex
# ---------------------------------------------------------------------------

_TAG_RE = re.compile(r"_\d{2}_\d{2}_\d{4}_\d{2}_\d{2}_\d{2}$")


def strip_filename_tag(name: str) -> str:
    """Strip ``_DD_MM_YYYY_HH_MM_SS`` suffix + .parquet
    (`src/pipeline/core/data_processing.py:32-35`)."""
    return _TAG_RE.sub("", name.replace(".parquet", ""))


def add_provenance(tbl: pa.Table, source_path: str) -> pa.Table:
    """Provenance column from the segment path (SURVEY.md M15 mapping)."""
    tag = strip_filename_tag(source_path.rsplit("/", 1)[-1])
    return tbl.append_column(
        "source_tag", pa.array([tag] * tbl.num_rows, pa.string())
    )


# ---------------------------------------------------------------------------
# M7: surrogate ids — deterministic, unlike monotonically_increasing_id
# ---------------------------------------------------------------------------


def add_surrogate_id(tbl: pa.Table, cols: list[str], name: str = "id") -> pa.Table:
    """Deterministic 64-bit surrogate id from the concatenated key columns —
    replaces Spark ``monotonically_increasing_id`` (`src/pipeline/core/
    spark.py:425,568`), which is nondeterministic across retries (SURVEY.md
    M7: ids must derive from content, e.g. (segment, lsn), not task order).
    Two differently-salted crc32s are packed into 64 bits: a single crc32
    reaches ~50% collision odds at only ~77k distinct keys, far below the
    10^10-event design point."""
    parts = [tbl.column(c).cast(pa.string()).to_pylist() for c in cols]

    def h64(row) -> int:
        key = "|".join(x if x is not None else "" for x in row).encode()
        return (zlib.crc32(key) << 32) | zlib.crc32(key + b"\x00s2")

    ids = np.fromiter(
        (h64(row) for row in zip(*parts)), dtype=np.uint64, count=tbl.num_rows
    )
    return tbl.append_column(name, pa.array(ids, pa.uint64()))
