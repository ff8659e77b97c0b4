"""Block-level hygiene helpers for Ray Data datasets.

Ray's executor emits ZERO-COLUMN empty blocks from group/sort splits
whenever blocks outnumber groups (each split range with no rows becomes
an empty block with an EMPTY schema).  ``map_batches`` passes them
through untouched — the UDF is never invoked on an empty block — and
any ``Dataset.join`` partition whose builder concats one produces a
schemaless table, failing inside the Arrow hash join with "No match or
multiple matches for key field reference FieldRef.Name(...)".  The
repo's other workarounds for the same artifact: bounded read blocks in
``pipelines/replay.bootstrap_lake`` and the num_columns filter in
``pipelines/queries.rollup_customers_region_segment``.
"""

from __future__ import annotations


def drop_empty_blocks(mat):
    """Strip zero-row blocks from a MATERIALIZED dataset.

    Metadata-only: block refs are re-listed by their ``num_rows``
    metadata, nothing is fetched to the driver — safe at any scale.
    Call this on a materialized dataset that is about to feed a
    ``Dataset.join`` side (either side) after a groupby/map_groups or
    sort, where the executor's schemaless empties would otherwise
    poison a join partition.
    """
    import ray as _ray

    refs = [
        ref
        for bundle in mat.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows
    ]
    return _ray.data.from_arrow_refs(refs) if refs else mat
