"""Per-partition column statistics in the manifest — file-skipping scan
pruning that never opens a parquet footer.

At 100 TB a lake table holds millions of part files.  Row-group pruning
(the existing ``read_table(predicate=...)`` path) still pays one
object-store GET per file to read the footer before it can skip
anything.  The fix every production table format ships (Iceberg
manifest entries, Delta Add.stats) is to record column min/max at WRITE
time — the writer already holds the table in memory, the stats are a
few hundred bytes — and let the scan planner drop whole files from the
manifest alone.  Reference analogue: the reference's MergeTree tables
get the same effect from ClickHouse primary-key sparse indexes
(src/pipeline/sql/create_tables.sql:20); this engine's manifest is
where that metadata lives.

Encoding (JSON-safe, schema-decoded at read time):

* int / uint / bool — plain ints;
* float — plain floats; a partition containing NaN/Inf in the column
  records no stats for it (unknown, never pruned);
* timestamp / date / time — integer ticks (``pa.scalar(...).value``)
  in the column's own unit; filter values normalize through the same
  scalar cast, so comparisons are tick-to-tick;
* string — bounds truncated to ``STR_CAP`` chars.  A truncated lower
  bound is still a valid lower bound; a truncated UPPER bound is made
  valid by incrementing its last code point (the Iceberg trick).  If
  the last code point is U+10FFFF the upper bound is dropped
  (unbounded above).  ``trunc`` marks truncation so ``!=`` pruning
  (which needs exact min==max) stays off for capped values;
* binary / nested / dictionary — never collected (the html payload
  column has no useful range).

Semantics: a column entry ``{"min": m, "max": M, "nulls": k}`` asserts
every non-null LIVE row value v satisfies m <= v <= M.  An entry
``{"nulls": k}`` with no bounds asserts the column is entirely null in
the file.  A column ABSENT from the stats dict is unknown — the
planner must keep the file.  Stats are computed over live (non-
tombstone) rows only: a scan serves only LWW winners that are live,
and every such row is a live row version of some file, so "no live row
version in any of the partition's files can match" proves "no served
row can match" — tombstones may be excluded from the ranges without
unsoundness (they only ever REMOVE rows from the served set).

Pruning is conservative by construction: absent stats keep the file,
renamed filter columns disable pruning for the whole scan (stats keys
are write-time names; walking each file's position in the rename chain
isn't worth the complexity), and ``!=`` prunes only exact-singleton
ranges.
"""

from __future__ import annotations

import json
import math

import pyarrow as pa
import pyarrow.compute as pc

STR_CAP = 64
MAX_STAT_COLS = 24
# capped distinct-value-hash set per column: equality pruning for
# categorical columns on hash-partitioned lakes, where min/max ranges
# cover everything and never skip.  64 hashes x 8 bytes bounds the
# manifest cost; columns with more distinct values record no vset
# (overflow = unknown, never pruned by value)
VSET_CAP = 64

# internal lake columns never worth bounding
_SKIP_ALWAYS = ("_deleted", "_lsn")


def _eligible(field: pa.Field) -> bool:
    t = field.type
    if field.name in _SKIP_ALWAYS:
        return False
    return (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_boolean(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_date(t)
        or pa.types.is_time(t)
        or pa.types.is_string(t)
        or pa.types.is_large_string(t)
    )


def _trunc_lower(s: str) -> str:
    return s[:STR_CAP]


def _trunc_upper(s: str) -> str | None:
    """A valid upper bound for s of at most STR_CAP chars, or None if
    one can't be built (last cap code point is U+10FFFF)."""
    if len(s) <= STR_CAP:
        return s
    head = s[:STR_CAP]
    for i in range(len(head) - 1, -1, -1):
        cp = ord(head[i])
        if cp < 0x10FFFF:
            return head[:i] + chr(cp + 1)
    return None


def table_stats(tbl: pa.Table) -> dict | None:
    """JSON-safe column stats for the LIVE rows of one part file.

    Caller passes the live (tombstone-filtered) table.  Returns None
    when nothing useful could be collected (stats stay absent from the
    manifest entry rather than writing an empty dict)."""
    out: dict[str, dict] = {}
    n = tbl.num_rows
    for field in tbl.schema:
        if len(out) >= MAX_STAT_COLS:
            break
        if not _eligible(field):
            continue
        col = tbl.column(field.name)
        nulls = col.null_count
        if n == 0:
            continue
        if nulls == n:
            out[field.name] = {"nulls": int(nulls)}
            continue
        t = field.type
        try:
            mm = pc.min_max(col)
        except pa.ArrowNotImplementedError:  # exotic type slipped through
            continue
        lo, hi = mm["min"], mm["max"]
        if not lo.is_valid or not hi.is_valid:
            continue
        ent: dict = {"nulls": int(nulls)}
        if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_integer(t):
            # capped distinct-value-hash set: exact equality pruning for
            # categorical columns whose RANGE never excludes anything on
            # a hash-partitioned lake.  Hashes of FULL values (immune to
            # the string bound truncation); absence is definite (the
            # hash of an absent value can only appear via a 2^-64
            # collision, and a collision only KEEPS a file — sound)
            from ..stages.hashutil import hash64 as _h64

            uniq = pc.unique(col.combine_chunks() if hasattr(col, "combine_chunks") else col)
            uniq = uniq.drop_null()
            if len(uniq) <= VSET_CAP:
                import numpy as _np

                ent["vset"] = sorted(
                    int(x) for x in _h64(uniq).view(_np.int64)
                )
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            lo_s, hi_s = lo.as_py(), hi.as_py()
            up = _trunc_upper(hi_s)
            ent["min"] = _trunc_lower(lo_s)
            if up is not None:
                ent["max"] = up
            if len(lo_s) > STR_CAP or len(hi_s) > STR_CAP:
                ent["trunc"] = True
        elif pa.types.is_floating(t):
            lo_f, hi_f = lo.as_py(), hi.as_py()
            # NaN poisons ordering guarantees; Inf is not JSON
            if not (math.isfinite(lo_f) and math.isfinite(hi_f)):
                continue
            has_nan = bool(
                pc.any(pc.is_nan(col)).as_py()
            )
            if has_nan:
                continue
            ent["min"], ent["max"] = lo_f, hi_f
        elif pa.types.is_boolean(t):
            ent["min"], ent["max"] = bool(lo.as_py()), bool(hi.as_py())
        elif pa.types.is_integer(t):
            ent["min"], ent["max"] = int(lo.as_py()), int(hi.as_py())
        else:  # timestamp / date / time → integer ticks in column unit
            ent["min"], ent["max"] = int(lo.value), int(hi.value)
        out[field.name] = ent
    return out or None


def stats_json(tbl: pa.Table) -> str:
    """table_stats serialized for the staging result row ('' = none)."""
    s = table_stats(tbl)
    return json.dumps(s, separators=(",", ":")) if s else ""


# -- filter normalization -------------------------------------------------

_OPS = ("==", "=", "!=", "<", "<=", ">", ">=", "in")


def _norm_value(value, t: pa.DataType):
    """Filter value → the stats encoding domain for column type t.

    Raises ValueError for values the column type cannot compare exactly
    — a non-integral float against an integer column would otherwise
    TRUNCATE (int(10.5) == 10) and make both the skip rule and the
    all-match rule silently wrong.  ``check_filters`` validates eagerly
    so every surface (read, count, export, CLI) errors up front instead
    of mis-pruning."""
    if pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t):
        return pa.scalar(value, t).value  # int ticks, unit-matched
    if pa.types.is_floating(t):
        return float(value)
    if pa.types.is_boolean(t):
        if not isinstance(value, bool):
            raise ValueError(
                f"boolean column filter needs a bool value, got {value!r}"
            )
        return value
    if pa.types.is_integer(t):
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            raise ValueError(
                f"integer column filter needs a numeric value, got {value!r}"
            )
        if isinstance(value, float):
            if not value.is_integer():
                raise ValueError(
                    f"integer column filter value {value!r} is not integral; "
                    "compare against an int (or cast the column)"
                )
            value = int(value)
        return value
    # string columns: coerce through str() so a CLI `url:==:42` (parsed
    # as int) compares as the string "42" — matching the expression
    # layer, which gets the same coercion in filters_to_expr
    return value if isinstance(value, str) else str(value)


def check_filters(filters, schema: pa.Schema) -> None:
    """Validate columns, ops AND values eagerly — a value the column
    type can't compare exactly must error here, at the API surface,
    not silently weaken the prune/all-match rules mid-plan."""
    for col, op, value in filters:
        if op not in _OPS:
            raise ValueError(f"unsupported filter op {op!r} (use {_OPS})")
        t = schema.field(col).type  # raises KeyError itself if absent
        try:
            if op == "in":
                for x in value:
                    _norm_value(x, t)
            else:
                _norm_value(value, t)
        except (pa.ArrowInvalid, TypeError, OverflowError) as e:
            raise ValueError(
                f"filter value {value!r} is not comparable against "
                f"column {col!r} ({t}): {e}"
            ) from e


def _vhash(value, t: pa.DataType) -> int:
    """The vset encoding of one filter value (same kernel as the
    writer: hash64 over a one-element arrow array of the column
    type)."""
    import numpy as _np

    from ..stages.hashutil import hash64 as _h64

    if pa.types.is_string(t) or pa.types.is_large_string(t):
        arr = pa.array([value if isinstance(value, str) else str(value)], t)
    else:
        arr = pa.array([int(value)], t)
    return int(_h64(arr).view(_np.int64)[0])


def file_excluded(stats: dict | None, filters, schema: pa.Schema) -> bool:
    """True iff the stats PROVE no live row of the file can satisfy ALL
    filters (filters are AND-combined, so one excluding conjunct
    suffices).  Unknown columns / absent stats never exclude."""
    if not stats:
        return False
    for col, op, value in filters:
        ent = stats.get(col)
        if ent is None:
            continue
        if "min" not in ent:
            # all-null column: no comparison matches a null (SQL semantics)
            return True
        t = schema.field(col).type
        try:
            if op == "in":
                v, vs = None, [_norm_value(x, t) for x in value]
            else:
                v, vs = _norm_value(value, t), None
        except (pa.ArrowInvalid, ValueError, TypeError, OverflowError):
            continue  # un-normalizable value: let the scan decide
        lo, hi = ent["min"], ent.get("max")
        vset = ent.get("vset")
        if op in ("==", "="):
            if v < lo or (hi is not None and v > hi):
                return True
            if vset is not None and _vhash(value, t) not in vset:
                return True  # definite absence (see table_stats note)
        elif op == ">":
            if hi is not None and hi <= v:
                return True
        elif op == ">=":
            if hi is not None and hi < v:
                return True
        elif op == "<":
            if lo >= v:
                return True
        elif op == "<=":
            if lo > v:
                return True
        elif op == "in":
            if not vs:
                return True  # IN () matches nothing
            if all(x < lo or (hi is not None and x > hi) for x in vs):
                return True
            if vset is not None and all(
                _vhash(x, t) not in vset for x in value
            ):
                return True
        elif op == "!=":
            if (
                hi is not None
                and lo == hi == v
                and not ent.get("trunc")
                and ent.get("nulls", 0) == 0
            ):
                return True
    return False


def union_stats(parts: list[dict | None]) -> dict | None:
    """Per-column UNION of file stats across a partition's base ∪ delta
    chain.  Any file with absent stats makes the whole partition
    unknown; a column missing from any file's dict is dropped.  The
    union is what makes pruning sound for COALESCE tables too: a served
    partial-image winner can mix column values from different files, so
    per-file AND-exclusion is wrong — but every served column value is
    still some live version's value, hence inside the union range."""
    if not parts or any(p is None for p in parts):
        return None
    cols = set(parts[0])
    for p in parts[1:]:
        cols &= set(p)
    out: dict[str, dict] = {}
    for c in cols:
        ents = [p[c] for p in parts]
        nulls = sum(int(e.get("nulls", 0)) for e in ents)
        bounded = [e for e in ents if "min" in e]
        if not bounded:
            out[c] = {"nulls": nulls}
            continue
        ent: dict = {
            "nulls": nulls,
            "min": min(e["min"] for e in bounded),
        }
        if all("max" in e for e in bounded):
            ent["max"] = max(e["max"] for e in bounded)
        if any(e.get("trunc") for e in ents):
            ent["trunc"] = True
        if all("vset" in e for e in bounded):
            u = set()
            for e in bounded:
                u |= set(e["vset"])
            if len(u) <= VSET_CAP:
                ent["vset"] = sorted(u)
        # an all-null sibling file means a served row CAN be null in
        # this column even though bounds exist -> keep nulls (already
        # summed); bounds stay valid for the non-null values
        out[c] = ent
    return out or None


def partition_excluded(meta: dict, filters, schema: pa.Schema) -> bool:
    """A partition (base file ∪ delta chain) is skippable iff the UNION
    of its files' live-row column ranges excludes some filter conjunct
    (see union_stats for why per-file exclusion would be unsound).
    Files with ZERO live rows (e.g. an all-tombstone delta) carry no
    stats by construction and contribute no servable values — they must
    not veto pruning."""
    parts: list[dict | None] = []
    rows = 0
    if meta.get("file") is not None:
        n = int(meta.get("rows", 0))
        rows += n
        if n:
            parts.append(meta.get("stats"))
    for d in meta.get("deltas", []) or []:
        n = int(d.get("rows", 0))
        rows += n
        if n:
            parts.append(d.get("stats"))
    if rows == 0:
        return True  # no live row versions anywhere in the partition
    return file_excluded(union_stats(parts), filters, schema)


def filters_to_expr(filters, schema: pa.Schema):
    """AND-combined pyarrow.dataset expression for row-group pushdown —
    the second pruning layer under the manifest-level skip."""
    import pyarrow.dataset as pads

    def _scal(v, t):
        # same string coercion as _norm_value: the two layers must
        # agree on what a filter value means
        if (pa.types.is_string(t) or pa.types.is_large_string(t)) and not isinstance(v, str):
            v = str(v)
        return pa.scalar(v, t)

    expr = None
    for col, op, value in filters:
        t = schema.field(col).type
        f = pads.field(col)
        if op == "in":
            e = f.isin([_scal(v, t) for v in value])
        else:
            v = _scal(value, t)
            e = {
                "==": f == v,
                "=": f == v,
                "!=": f != v,
                "<": f < v,
                "<=": f <= v,
                ">": f > v,
                ">=": f >= v,
            }[op]
        expr = e if expr is None else expr & e
    return expr


def rename_blocks_pruning(filters, renames) -> bool:
    """Conservative guard: if any filter column appears on either side
    of the rename chain, manifest stats (written under historical
    names) can't be trusted keyed by the current name."""
    if not renames:
        return False
    touched = {r["from"] for r in renames} | {r["to"] for r in renames}
    return any(col in touched for col, _, _ in filters)
