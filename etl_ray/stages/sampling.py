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


def _digest_u32(keys: list, salt: str) -> np.ndarray:
    """First 32 bits of md5(salt + str(key)) as uint64 (room for the
    integer cross-multiplication in weighted_mask without overflow)."""
    pre = salt.encode()
    return np.array(
        [
            int.from_bytes(hashlib.md5(pre + str(k).encode()).digest()[:4], "big")
            for k in keys
        ],
        dtype=np.uint64,
    )


def weighted_mask(
    batch: pa.Table,
    key: str,
    weight_col: str,
    scale: int,
    salt: str = "wb1:",
) -> np.ndarray:
    """Weighted Bernoulli keep-mask: row i is kept with probability
    min(1, w_i / scale) where w_i is its integer ``weight_col`` value.

    INTEGER-EXACT predicate — ``digest32 * scale < w * 2**32`` in uint64
    arithmetic, no float anywhere — so DuckDB evaluates the identical
    predicate bit-for-bit (``('0x'||substr(md5(..),1,8))::BIGINT * scale
    < w * 4294967296``), making the operator hash-checkable like
    ``hash_sample``.  Deterministic, row-local, shuffle-free; importance
    sampling by length/score is the training-mix use."""
    h = _digest_u32(batch.column(key).to_pylist(), salt)
    w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.uint64)
    return h * np.uint64(scale) < w * np.uint64(2**32)


def weighted_sample(ds, key: str, weight_col: str, scale: int, salt: str = "wb1:"):
    """Deterministic weighted Bernoulli sample (see weighted_mask)."""

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(weighted_mask(t, key, weight_col, scale, salt)))

    return ds.map_batches(f, batch_format="pyarrow")


def aes_keys(batch: pa.Table, key: str, weight_col: str, salt: str = "aes1:") -> np.ndarray:
    """Efraimidis–Spirakis exponential race keys: ln(u) / w with
    u = (digest32 + 0.5) / 2**32 in (0, 1).  Maximizing this key is
    equivalent to maximizing u^(1/w); the top-k rows by key are a
    weighted sample WITHOUT replacement with inclusion proportional to
    the (positive) weights.  Deterministic in (key, salt)."""
    h = _digest_u32(batch.column(key).to_pylist(), salt).astype(np.float64)
    u = (h + 0.5) / 2.0**32
    w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
    if np.any(w <= 0):
        raise ValueError("weighted_topk requires strictly positive weights")
    return np.log(u) / w


def weighted_topk(ds, key: str, weight_col: str, k: int, salt: str = "aes1:"):
    """Weighted sample of exactly ``k`` rows WITHOUT replacement
    (Efraimidis–Spirakis A-ES): global top-k by the exponential race
    key.  Scale shape: each batch prunes itself to its local top-k
    (argpartition, O(batch)), so the final sort+limit sees at most
    k × num_batches narrow rows — never the corpus.  The float race key
    is dropped from the output; ties (impossible in practice for
    distinct md5 inputs) break by ``key`` ascending.

    The selection is a pure function of (key, salt, weights) — exactly
    reproducible across runs and cluster widths, like hash_sample — but
    the race key is a FLOAT (libm log), so cross-engine oracles can
    differ in the last ulp; correctness is pinned by a same-arithmetic
    differential test instead of a SQL oracle (tests/test_round4_ops)."""

    def prune(t: pa.Table) -> pa.Table:
        skey = aes_keys(t, key, weight_col, salt)
        t = t.append_column("_skey", pa.array(skey, pa.float64()))
        if t.num_rows > k:
            idx = np.argpartition(-skey, k - 1)[:k]
            t = t.take(pa.array(np.sort(idx), pa.int64()))
        return t

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    top = pruned.sort(["_skey", key], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda t: t.drop_columns(["_skey"]), batch_format="pyarrow"
    )


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
