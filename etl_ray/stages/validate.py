"""Change-event validation → dead-letter routing (DLQ).

Real CDC feeds carry garbage: op codes outside the insert/update/delete
vocabulary, null upsert keys, null ordering timestamps.  The reference
has no quarantine at all — a malformed row either crashes the batch or
silently corrupts the upsert (its normalize projections assume clean
topics, `src/pipeline/core/client_clickhouse.py:39-58` in
/root/reference).  Here malformed events are classified VECTORIZED in
the replay combiner, ride the SAME pid shuffle as valid events (no
second read pass over the WAL), and are staged per partition by the
merge task, then committed atomically into the table's quarantine area
(``dlq/``) with per-transaction lineage counts.  Exactly-once applies
to the DLQ too: a redelivered segment is skipped at file/LSN level, so
quarantined rows are never duplicated.

``event_reasons`` returns one string per row — a reason code for
malformed rows, null for valid ones.  First matching rule wins; rules
are Arrow-kernel evaluations, no Python per row.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

ALLOWED_OPS = ("insert", "update", "delete")

#: marker column carried through the shuffle; null == valid row
DLQ_COL = "_dlq_reason"


def event_reasons(
    batch: pa.Table,
    key: str,
    ts_col: str,
    allowed_ops: tuple[str, ...] = ALLOWED_OPS,
) -> pa.Array:
    """Classify each WAL event: null = valid, else a reason code.

    Rules (first match wins):
      * ``null_key`` — upsert key is null (row cannot be partitioned)
      * ``null_ts``  — LWW ordering column is null (row cannot be ordered)
      * ``bad_op``   — op outside the insert/update/delete vocabulary
    """
    n = batch.num_rows
    reason = pa.nulls(n, pa.string())
    if "op" in batch.column_names:
        op = batch.column("op")
        bad_op = pc.invert(
            pc.fill_null(pc.is_in(op, value_set=pa.array(allowed_ops)), False)
        )
        reason = pc.if_else(bad_op, pa.scalar("bad_op", pa.string()), reason)
    if ts_col in batch.column_names:
        reason = pc.if_else(
            pc.is_null(batch.column(ts_col)),
            pa.scalar("null_ts", pa.string()),
            reason,
        )
    if key in batch.column_names:
        reason = pc.if_else(
            pc.is_null(batch.column(key)),
            pa.scalar("null_key", pa.string()),
            reason,
        )
    return reason.combine_chunks() if isinstance(reason, pa.ChunkedArray) else reason


def constraint_reasons(
    batch: pa.Table,
    rules: list[dict],
    base_reasons: pa.Array,
) -> pa.Array:
    """Layer declarative CHECK-constraint classification on top of the
    built-in reasons (Delta-Lake-style commit-time expectations, stored
    in the table manifest by ``maintenance.set_constraint``).

    SQL CHECK semantics: a row VIOLATES only when the predicate
    evaluates to FALSE — a null predicate (null column value) PASSES,
    except under the valueless ``notnull`` op, whose mask is a definite
    False on nulls (SQL NOT NULL)
    (``stages/predicate.pred_mask_raw`` three-valued logic, the
    opposite null policy from ``delete_where``).  ``delete`` events are
    exempt: the row image is being removed, so its (usually null,
    possibly stale) payload is not subject to the invariant.  Built-in
    reasons win over constraints; among constraints, rule-list order
    (name order) wins.  Violators are quarantined with reason
    ``constraint:<name>`` and ride the normal DLQ path — exactly-once,
    full payload retained for inspection/repair.

    Each rule: ``{"name", "op", "value", "aliases"}`` where ``aliases``
    lists the storage-era names of the constrained column, newest first
    (a WAL producer may still ship a pre-rename name); the first alias
    present in the batch is evaluated, and a batch carrying none of
    them cannot violate (the merged value would be null → CHECK passes).
    """
    from .predicate import pred_mask_raw

    reason = base_reasons
    not_delete = None
    if "op" in batch.column_names:
        not_delete = pc.invert(
            pc.fill_null(pc.equal(batch.column("op"), "delete"), False)
        )
    for rule in rules:
        col = next(
            (a for a in rule["aliases"] if a in batch.column_names), None
        )
        if col is None:
            continue
        viol = pc.fill_null(
            pc.invert(pred_mask_raw(batch.column(col), rule["op"], rule["value"])),
            False,
        )
        if not_delete is not None:
            viol = pc.and_(viol, not_delete)
        viol = pc.and_(viol, pc.is_null(reason))
        reason = pc.if_else(
            viol, pa.scalar(f"constraint:{rule['name']}", pa.string()), reason
        )
    return reason.combine_chunks() if isinstance(reason, pa.ChunkedArray) else reason


def split_dlq(tbl: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Split a shuffled group into (valid, quarantined) rows on the
    ``_dlq_reason`` marker.  Tables without the marker are all-valid."""
    if DLQ_COL not in tbl.column_names:
        return tbl, None
    mask = pc.is_valid(tbl.column(DLQ_COL))
    if not pc.any(mask).as_py():
        return tbl.drop_columns([DLQ_COL]), None
    bad = tbl.filter(mask)
    good = tbl.filter(pc.invert(mask)).drop_columns([DLQ_COL])
    return good, bad
