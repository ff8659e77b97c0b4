"""Deterministic hash-based sampling (Bernoulli + stratified).

Training-data pipelines need samples that are REPRODUCIBLE across runs,
cluster sizes and block layouts — held-out eval splits, per-language
rebalancing, cheap corpus previews.  ``random_shuffle``/``random_sample``
can't give that (row order and RNG streams depend on block layout), so
sampling here is a pure row-local predicate on a keyed hash:

    keep  <=>  md5(salt + str(key))[:8]  <  threshold_hex(rate)

* shuffle-free and streaming: one ``map_batches`` filter, no
  repartition, no driver state — identical cost profile at 100 TB;
* exactly reproducible: the kept set is a pure function of
  (key, salt) — rerunning, resuming, or changing cluster width cannot
  change membership, and disjoint salts give independent samples
  (train/eval splits that provably never overlap);
* oracle-checkable: DuckDB's ``md5(VARCHAR)`` produces the same digest,
  so the same predicate is expressible in ANSI SQL (fixed-width
  lowercase-hex string compare == numeric compare).

The md5-per-key loop is C-speed via ``hashlib`` (~1-2M keys/s/core);
it is the same cost class as the crc32 pid loop in
`stages/partition.py` and vectorizes across batches, not rows.

The reference has no sampling operator; this extends its transform set
(SURVEY.md §2.9) the way a webtext training pipeline needs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def rate_threshold_hex(rate: float) -> str:
    """First-8-hex-chars threshold for a keep probability in [0, 1]."""
    r = min(max(float(rate), 0.0), 1.0)
    return format(min(int(r * 2**32), 2**32 - 1), "08x") if r < 1.0 else "ffffffff~"
    # the trailing '~' sorts above every hex char: rate=1.0 keeps ALL rows
    # including the digest 'ffffffff' itself


def _digest8(keys: list, salt: str) -> np.ndarray:
    pre = salt.encode()
    return np.array(
        [hashlib.md5(pre + str(k).encode()).hexdigest()[:8] for k in keys],
        dtype="U8",
    )


def sample_mask(batch: pa.Table, key: str, rate: float, salt: str = "v1:") -> np.ndarray:
    """Boolean keep-mask for one batch (row-local, deterministic)."""
    d8 = _digest8(batch.column(key).to_pylist(), salt)
    return d8 < rate_threshold_hex(rate)


def stratified_mask(
    batch: pa.Table,
    key: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "v1:",
) -> np.ndarray:
    """Per-stratum keep-mask: each row's threshold comes from its
    ``strata_col`` value (e.g. rebalance languages: keep 12% of ``en``,
    100% of ``de``).  Unlisted strata fall back to ``default_rate``."""
    d8 = _digest8(batch.column(key).to_pylist(), salt)
    thr = {s: rate_threshold_hex(r) for s, r in rates.items()}
    dflt = rate_threshold_hex(default_rate)
    strata = batch.column(strata_col).to_pylist()
    row_thr = np.array([thr.get(s, dflt) for s in strata], dtype="U9")
    return d8 < row_thr


def hash_sample(ds, key: str, rate: float, salt: str = "v1:"):
    """Deterministic Bernoulli sample of a Dataset (see module doc)."""

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(sample_mask(t, key, rate, salt)))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(
    ds,
    key: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "v1:",
):
    """Deterministic stratified sample with per-stratum rates."""

    def f(t: pa.Table) -> pa.Table:
        return t.filter(
            pa.array(stratified_mask(t, key, strata_col, rates, default_rate, salt))
        )

    return ds.map_batches(f, batch_format="pyarrow")


def split(ds, key: str, eval_rate: float, salt: str = "split:"):
    """Disjoint deterministic train/eval split: (train_ds, eval_ds).

    Both sides evaluate the SAME predicate with opposite sign, so the
    split is a partition of the input — no row in both, none dropped —
    regardless of execution order or cluster width."""
    thr = rate_threshold_hex(eval_rate)

    def keep_eval(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(_digest8(t.column(key).to_pylist(), salt) < thr))

    def keep_train(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(~(_digest8(t.column(key).to_pylist(), salt) < thr)))

    return (
        ds.map_batches(keep_train, batch_format="pyarrow"),
        ds.map_batches(keep_eval, batch_format="pyarrow"),
    )
