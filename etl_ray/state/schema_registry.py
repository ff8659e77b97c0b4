"""Additive-only schema evolution (SchemaRegistry).

The reference declines automatic schema merging
(`spark.sql.parquet.mergeSchema=false`, `src/pipeline/core/spark.py:43` in
/root/reference) and hand-maintains DDL (`src/pipeline/sql/create_tables.sql`).
Here additive evolution is first-class: new WAL columns (the ``lang``
fixture) widen the lake schema; existing rows are backfilled with nulls at
merge time; type changes are rejected.

The registry's durable form lives inside the table MANIFEST (versioned,
swapped atomically with the data it describes), so schema version N is
always consistent with the files of transaction N.  This module is the
pure logic: unify / validate / conform.
"""

from __future__ import annotations

import pyarrow as pa


class SchemaEvolutionError(ValueError):
    pass


def evolve(current: pa.Schema, incoming: pa.Schema) -> pa.Schema:
    """Return current schema widened with incoming's new fields (additive).

    Raises on type conflicts — only add-column evolution is supported,
    mirroring the explicit projection discipline of the reference's
    per-topic transforms (`src/pipeline/core/spark.py:108-121`).
    """
    out_fields = list(current)
    names = {f.name for f in current}
    for f in incoming:
        if f.name in names:
            cur = current.field(f.name)
            if cur.type != f.type:
                raise SchemaEvolutionError(
                    f"type change for column {f.name!r}: {cur.type} -> {f.type}"
                )
        else:
            out_fields.append(pa.field(f.name, f.type))
    return pa.schema(out_fields)


def conform(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Project ``table`` to ``target``: missing columns -> all-null arrays,
    extra columns dropped, column order normalized.  Vectorized (no row
    iteration); null backfill is O(1) per column via pa.nulls."""
    n = table.num_rows
    cols = []
    for f in target:
        if f.name in table.column_names:
            col = table.column(f.name)
            if col.type != f.type:
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.table(cols, schema=target)


def unify(schemas: list[pa.Schema]) -> pa.Schema:
    out = schemas[0]
    for s in schemas[1:]:
        out = evolve(out, s)
    return out
