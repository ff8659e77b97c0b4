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


_INT_ORDER = {pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3}
_UINT_ORDER = {pa.uint8(): 0, pa.uint16(): 1, pa.uint32(): 2, pa.uint64(): 3}
_TS_ORDER = {"s": 0, "ms": 1, "us": 2, "ns": 3}


def widen_type(a: pa.DataType, b: pa.DataType) -> pa.DataType | None:
    """The narrowest type BOTH cast into losslessly, or None.

    Promotion lattice (each step is an exact cast):
      * signed ints widen along int8 < int16 < int32 < int64;
      * unsigned ints widen along uint8 < ... < uint64; an unsigned
        value fits the NEXT WIDER signed type (uint32 -> int64), so a
        signed/unsigned mix promotes there (uint64+signed has no exact
        home and stays a conflict);
      * float32 < float64; ints of <= 32 bits fit float64 exactly
        (53-bit mantissa); 64-bit ints do NOT — conflict;
      * timestamps widen to the FINER unit (s -> ms -> us -> ns),
        same-timezone only.
    """
    if a.equals(b):
        return a
    if a in _INT_ORDER and b in _INT_ORDER:
        return a if _INT_ORDER[a] >= _INT_ORDER[b] else b
    if a in _UINT_ORDER and b in _UINT_ORDER:
        return a if _UINT_ORDER[a] >= _UINT_ORDER[b] else b
    if (a in _INT_ORDER) != (b in _INT_ORDER) and (
        a in _UINT_ORDER or b in _UINT_ORDER
    ):
        u, s = (a, b) if a in _UINT_ORDER else (b, a)
        if u not in _UINT_ORDER or s not in _INT_ORDER:
            return None
        if u == pa.uint64():
            return None  # uint64 has no exact signed home
        need = max(_UINT_ORDER[u] + 1, _INT_ORDER[s])
        return [pa.int8(), pa.int16(), pa.int32(), pa.int64()][need]
    floats = {pa.float32(): 0, pa.float64(): 1}
    if a in floats and b in floats:
        return pa.float64()
    for f, i in ((a, b), (b, a)):
        if f in floats and i in _INT_ORDER and _INT_ORDER[i] <= 2:
            return pa.float64()
        if f in floats and i in _UINT_ORDER and _UINT_ORDER[i] <= 2:
            return pa.float64()
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b) and a.tz == b.tz:
        unit = a.unit if _TS_ORDER[a.unit] >= _TS_ORDER[b.unit] else b.unit
        return pa.timestamp(unit, tz=a.tz)
    return None


def evolve(current: pa.Schema, incoming: pa.Schema) -> pa.Schema:
    """Return current schema evolved with incoming: new fields appended
    (additive), existing fields WIDENED along the exact-cast promotion
    lattice (``widen_type``) when the incoming type differs — the CDC
    reality of upstream columns growing (int32 ids overflowing to
    int64, float metrics becoming double, timestamps gaining
    precision).  Raises on any non-lossless conflict.

    The reference declines all of this
    (`spark.sql.parquet.mergeSchema=false`, `src/pipeline/core/spark.py:43`)
    and hand-maintains DDL; here both directions conform at merge time
    (``conform`` casts stored and incoming rows up to the unified type).
    """
    out_fields = list(current)
    names = {f.name: i for i, f in enumerate(current)}
    for f in incoming:
        if f.name in names:
            cur = current.field(f.name)
            if cur.type != f.type:
                w = widen_type(cur.type, f.type)
                if w is None:
                    raise SchemaEvolutionError(
                        f"type change for column {f.name!r}: {cur.type} -> {f.type}"
                    )
                out_fields[names[f.name]] = pa.field(f.name, w)
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


# ---------------------------------------------------------------------------
# column renames (metadata-only; no file rewrite)
# ---------------------------------------------------------------------------


def apply_renames(obj, renames):
    """Normalize historical column names to CURRENT names.

    ``renames`` is the manifest's ordered rename chain
    (``[{"from": old, "to": new}, ...]``).  A stored file reflects some
    PREFIX of the chain (files are written conforming to the schema of
    their transaction), so applying the chain in order maps any era's
    names forward: a step renames ``from`` -> ``to`` only when ``from``
    is present and ``to`` is absent (post-rename files are untouched;
    re-used names across eras resolve correctly because each file only
    ever carries one era's name).  Accepts a ``pa.Table`` or
    ``pa.Schema``; zero-copy for tables (rename only).  Incoming WAL
    payloads still keyed by source-era names normalize through the same
    chain at merge time."""
    if not renames:
        return obj
    names = list(obj.names if isinstance(obj, pa.Schema) else obj.column_names)
    changed = False
    for r in renames:
        if r["from"] in names and r["to"] not in names:
            names[names.index(r["from"])] = r["to"]
            changed = True
    if not changed:
        return obj
    if isinstance(obj, pa.Schema):
        return pa.schema(
            [f.with_name(n) for f, n in zip(obj, names)], metadata=obj.metadata
        )
    return obj.rename_columns(names)


def storage_aliases(name: str, renames) -> list[str]:
    """Every name a CURRENT column may carry inside stored files (the
    current name plus each historical name along the rename chain,
    walked newest-to-oldest) — the projection set for pruned reads of
    pre-rename files."""
    out = [name]
    have = {name}
    for r in reversed(renames or ()):
        if r["to"] in have and r["from"] not in have:
            out.append(r["from"])
            have.add(r["from"])
    return out


def current_name(name: str, renames) -> str:
    """Follow the rename chain FORWARD: the name a column is currently
    known by, given any historical name."""
    for r in renames or ():
        if name == r["from"]:
            name = r["to"]
    return name
