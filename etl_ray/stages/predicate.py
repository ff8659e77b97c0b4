"""Shared column-predicate vocabulary: ``eq | prefix | in | lt | le | gt
| ge | notnull`` over one column.

Two consumers with OPPOSITE null semantics share these kernels:

* ``delete_where`` (pipelines/maintenance.py) — "which rows MATCH the
  predicate": nulls never match (``pred_mask``).
* CHECK constraints (stages/validate.py) — "which rows VIOLATE the
  invariant": SQL CHECK semantics, a row violates only when the
  predicate evaluates to FALSE, so nulls PASS (callers build that from
  ``pred_mask_raw``).

``stats_admit`` is the parquet footer-statistics test both use for
metadata-only pruning: may a row group with column range [lo, hi]
contain a matching row?  Conservative — only ever False when no match
is possible.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

PRED_OPS = ("eq", "prefix", "in", "lt", "le", "gt", "ge", "notnull")


def pred_mask_raw(arr, op: str, value) -> pa.BooleanArray:
    """Vectorized predicate over one column; null stays null (three-
    valued logic) — callers pick the null policy.

    ``notnull`` is the exception in both ways: it is VALUELESS (``value``
    ignored, store None) and never yields null — a null value evaluates
    to a definite False, so under CHECK semantics (violate on FALSE)
    nulls violate.  That is exactly SQL's ``NOT NULL``: the one
    constraint where a null does not pass."""
    if op == "notnull":
        return pc.is_valid(arr)
    if op == "eq":
        return pc.equal(arr, value)
    if op == "prefix":
        return pc.starts_with(arr, value)
    if op == "in":
        # is_in maps null -> false regardless of skip_nulls; restore
        # three-valued logic (null IN (...) is null) so CHECK consumers
        # get null-passes and delete_where's fill_null(False) is a no-op
        m = pc.is_in(arr, value_set=pa.array(list(value)))
        return pc.if_else(pc.is_null(arr), pa.scalar(None, pa.bool_()), m)
    if op == "lt":
        return pc.less(arr, value)
    if op == "le":
        return pc.less_equal(arr, value)
    if op == "gt":
        return pc.greater(arr, value)
    if op == "ge":
        return pc.greater_equal(arr, value)
    raise ValueError(f"predicate op must be one of {PRED_OPS}, got {op!r}")


def pred_mask(arr, op: str, value) -> pa.BooleanArray:
    """Matching rows; nulls never match."""
    return pc.fill_null(pred_mask_raw(arr, op, value), False)


def stats_admit(lo, hi, op: str, value) -> bool:
    """True if a row group with column range [lo, hi] COULD contain a
    match.  Conservative: only ever returns False when no match is
    possible.  ``notnull`` always admits here — min/max stats existing
    at all implies non-null values exist (null-count pruning is the
    probes' job, not this range test)."""
    if op == "notnull":
        return True
    try:
        if op == "eq":
            return lo <= value <= hi
        if op == "in":
            return any(lo <= v <= hi for v in value)
        if op == "prefix":
            # v startswith p  =>  v >= p (bytewise) and v[:len(p)] == p;
            # lo <= v forces lo[:len(p)] <= p, hi >= v forces hi >= p
            return hi >= value and lo[: len(value)] <= value
        if op == "lt":
            return lo < value
        if op == "le":
            return lo <= value
        if op == "gt":
            return hi > value
        if op == "ge":
            return hi >= value
    except TypeError:
        return True  # incomparable stats (type mismatch) — keep the file
    return True


def stats_all_satisfy(lo, hi, op: str, value) -> bool:
    """True only when [lo, hi] PROVES every non-null value in the row
    group satisfies the predicate — the CHECK-constraint verification
    pruning test (nulls satisfy CHECK by definition, and parquet min/max
    statistics cover non-null values only, so null_count is irrelevant
    here).  Conservative the other way round from ``stats_admit``: when
    in doubt (incomparable stats, unprovable op) returns False and the
    caller falls back to reading the data."""
    try:
        if op == "eq":
            return lo == value and hi == value
        if op == "in":
            return lo == hi and lo in set(value)
        if op == "prefix":
            # shared-prefix interval: if lo and hi both start with p,
            # every v with lo <= v <= hi has v[:len(p)] in [p, p] == p
            return lo[: len(value)] == value and hi[: len(value)] == value
        if op == "lt":
            return hi < value
        if op == "le":
            return hi <= value
        if op == "gt":
            return lo > value
        if op == "ge":
            return lo >= value
    except TypeError:
        return False
    return False
