"""Semi/anti join with a broadcast-vs-shuffle switch.

The reference's only anti/semi machinery is a driver-collected key list
(`src/pipeline/core/spark.py:135-140`) — fine when the key side is tiny,
a driver OOM when it is not.  Here one logical operator carries BOTH
physical plans:

* **broadcast** (key side at or below ``broadcast_limit`` rows): the
  unique key array is ``ray.put`` once and every left batch filters with
  ``pc.is_in`` — zero shuffle, the left side streams.
* **shuffle** (key side larger): native hash-partitioned
  ``Dataset.join`` with ``left_semi`` / ``left_anti`` — both sides
  exchange once, nothing corpus-sized touches the driver.

The switch is decided from real data, not a guess: the key side is
materialized (it stays SHARDED in the object store — only the broadcast
path ever concatenates it), and ``count()`` on a materialized Dataset is
a metadata read.  The key side is typically the output of a filter the
caller wants computed exactly once anyway.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray

# ~4M int64 keys = 32 MB per task heap — comfortably broadcastable; set
# ETLRAY_BROADCAST_LIMIT=0 to force the shuffle path everywhere.
_DEFAULT_LIMIT = 4_000_000


def key_filter_join(
    left,
    keys,
    *,
    left_on: str,
    right_on: str,
    anti: bool = False,
    broadcast_limit: int | None = None,
):
    """Return rows of ``left`` whose ``left_on`` is (semi) / is not (anti)
    in ``keys[right_on]``.  Output schema = left schema, order-free.

    ``keys`` may carry extra columns; only ``right_on`` is consulted and
    duplicates are harmless (semi/anti semantics never duplicate left
    rows).
    """
    if broadcast_limit is None:
        broadcast_limit = int(
            os.environ.get("ETLRAY_BROADCAST_LIMIT", str(_DEFAULT_LIMIT))
        )

    keyed = keys.select_columns([right_on]).materialize()
    if keyed.count() <= broadcast_limit:
        key_tbl = pa.concat_tables(ray.get(keyed.to_arrow_refs()))
        keys_ref = ray.put(pc.unique(key_tbl[right_on].combine_chunks()))

        def flt(t: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            mask = pc.is_in(t[left_on], value_set=ks)
            return t.filter(pc.invert(mask) if anti else mask)

        return left.map_batches(flt, batch_format="pyarrow")

    # shuffle path — with a distributed Bloom prefilter (stages/bloom.py)
    # so the exact join exchanges only the rows the filter cannot decide:
    # bloom-NEGATIVE left rows are definite non-members (no false
    # negatives) — an anti join emits them immediately, a semi join
    # drops them — and only bloom-positive rows (matches + ~1% FP) pay
    # the all-to-all exchange.  ETLRAY_BLOOM=0 disables.
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    npart = max(2, min(200, ncpu // 2))
    use_bloom = os.environ.get("ETLRAY_BLOOM", "1") != "0"
    undecided = left
    passthrough = None
    if use_bloom:
        from .bloom import bloom_build, bloom_contains

        words, k = bloom_build(keyed, right_on, n_keys=keyed.count())
        words_ref = ray.put(words)

        def split(maybe: bool):
            def flt(t: pa.Table) -> pa.Table:
                hit = bloom_contains(ray.get(words_ref), t[left_on], k)
                return t.filter(pa.array(hit if maybe else ~hit))

            flt.__name__ = "bloom_maybe" if maybe else "bloom_negative"
            return flt

        undecided = left.map_batches(split(True), batch_format="pyarrow")
        if anti:
            # definite non-members skip the exchange entirely
            passthrough = left.map_batches(split(False), batch_format="pyarrow")
    joined = undecided.join(
        keyed,
        "left_anti" if anti else "left_semi",
        num_partitions=npart,
        on=(left_on,),
        right_on=(right_on,),
    )
    return joined.union(passthrough) if passthrough is not None else joined
