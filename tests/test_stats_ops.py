"""Round-5 statistics operators: grouped OLS regression, grouped
skewness/kurtosis from exact integer moments, Gini via the distributed
rank scan.

Differentials against plain-Python/numpy references on crafted inputs
(the repo's standard pattern); the sf0.01 DuckDB hash checks live in the
sweep (tools/sweep_correctness.py)."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_regr_matches_numpy_polyfit(ray_session):
    from etl_ray.pipelines.queries import regr_price_on_qty_by_retflag

    out = regr_price_on_qty_by_retflag(SF).to_pandas().set_index("l_returnflag")

    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    ).to_pandas()
    t["x"] = np.floor(t.l_quantity * 100).astype(np.int64)
    t["y"] = np.floor(t.l_extendedprice * 100).astype(np.int64)
    for flag, g in t.groupby("l_returnflag"):
        slope, intercept = np.polyfit(g.x, g.y, 1)
        r = np.corrcoef(g.x, g.y)[0, 1]
        row = out.loc[flag]
        assert row["n_rows"] == len(g)
        assert row["slope"] == pytest.approx(slope, rel=1e-9)
        assert row["intercept"] == pytest.approx(intercept, rel=1e-9)
        assert row["r2"] == pytest.approx(r * r, rel=1e-9)


def test_skew_kurtosis_match_numpy_moments(ray_session):
    from etl_ray.pipelines.queries import skew_kurtosis_quantity_by_retflag

    out = (
        skew_kurtosis_quantity_by_retflag(SF)
        .to_pandas()
        .set_index("l_returnflag")
    )
    t = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    ).to_pandas()
    t["x"] = np.floor(t.l_quantity).astype(np.int64)
    for flag, g in t.groupby("l_returnflag"):
        d = g.x.to_numpy() - g.x.mean()
        m2, m3, m4 = (np.mean(d**k) for k in (2, 3, 4))
        row = out.loc[flag]
        assert row["n_rows"] == len(g)
        assert row["skewness"] == pytest.approx(m3 / m2**1.5, rel=1e-9)
        assert row["kurtosis_excess"] == pytest.approx(m4 / m2**2 - 3.0, rel=1e-9)


def _gini_reference(x: np.ndarray) -> float:
    x = np.sort(x)
    n = len(x)
    rk = np.arange(1, n + 1)
    return float(2 * int((rk * x).sum()) - (n + 1) * int(x.sum())) / float(
        n * int(x.sum())
    )


def test_gini_matches_sorted_reference(ray_session):
    from etl_ray.pipelines.queries import gini_user_spend

    out = gini_user_spend(SF).to_pandas()
    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "value"]).to_pandas()
    t["x"] = np.floor(t.value * 100).astype(np.int64)
    spend = t.groupby("user_id").x.sum().to_numpy()
    assert int(out.n_users[0]) == len(spend)
    assert out.gini[0] == pytest.approx(_gini_reference(spend), abs=1e-12)
    assert 0.0 <= out.gini[0] <= 1.0


def test_gini_known_values():
    # perfectly equal spend -> G = (2*Σi*x - (n+1)*n*x) / (n²x)
    #   Σi = n(n+1)/2 -> numerator 0
    assert _gini_reference(np.full(10, 7, np.int64)) == 0.0
    # one user owns everything (n=4): ranks of [0,0,0,T] ->
    # G = (2*4T - 5T) / 4T = 3/4
    assert _gini_reference(np.array([0, 0, 0, 100], np.int64)) == 0.75


def test_gini_pack_contract_guard(ray_session, tmp_path):
    """user_id beyond 2^24 must raise, not silently mis-rank."""
    import ray.data

    from etl_ray.pipelines.queries import gini_user_spend

    t = pa.table(
        {
            "user_id": pa.array([1 << 30, 2], pa.int64()),
            "value": pa.array([1.0, 2.0]),
            # events schema superset: reader prunes to (user_id, value)
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    with pytest.raises(Exception, match="pack contract"):
        gini_user_spend(str(d)).to_pandas()


def test_gini_by_type_matches_per_group_reference(ray_session):
    from etl_ray.pipelines.queries import gini_spend_by_type

    out = gini_spend_by_type(SF).to_pandas().set_index("event_type")
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["event_type", "user_id", "value"]
    ).to_pandas()
    t["x"] = np.floor(t.value * 100).astype(np.int64)
    for etype, g in t.groupby("event_type"):
        spend = g.groupby("user_id").x.sum().to_numpy()
        assert out.loc[etype, "n_users"] == len(spend)
        assert out.loc[etype, "gini"] == pytest.approx(
            _gini_reference(spend), abs=1e-12
        )


def test_mannwhitney_u_identity_and_scipy_convention(ray_session):
    """U_click + U_purchase must equal n_click * n_purchase (exact
    integer identity of the rank-sum construction)."""
    from etl_ray.pipelines.queries import mannwhitney_click_vs_purchase

    out = mannwhitney_click_vs_purchase(SF).to_pandas().set_index("event_type")
    assert set(out.index) == {"click", "purchase"}
    na, nb = int(out.loc["click", "n_rows"]), int(out.loc["purchase", "n_rows"])
    ua, ub = int(out.loc["click", "u_stat"]), int(out.loc["purchase", "u_stat"])
    assert ua + ub == na * nb
    # rank sums cover 1..n exactly once
    n = na + nb
    assert int(out.rank_sum.sum()) == n * (n + 1) // 2
    # differential vs a plain-python rank over the same tie order
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["event_type", "value", "event_id"]
    ).to_pandas()
    t = t[t.event_type.isin(["click", "purchase"])].copy()
    t["x"] = np.floor(t.value * 100).astype(np.int64)
    t = t.sort_values(["x", "event_id"]).reset_index(drop=True)
    t["rk"] = np.arange(1, len(t) + 1)
    ref = t.groupby("event_type").rk.sum()
    assert int(out.loc["click", "rank_sum"]) == int(ref["click"])
    assert int(out.loc["purchase", "rank_sum"]) == int(ref["purchase"])


def test_theil_matches_plain_python(ray_session):
    import math

    from etl_ray.pipelines.queries import theil_index_user_spend

    out = theil_index_user_spend(SF).to_pandas()
    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "value"]).to_pandas()
    t["x"] = np.floor(t.value * 100).astype(np.int64)
    spend = t.groupby("user_id").x.sum().to_numpy()
    n = len(spend)
    sxl = sum(int(math.floor(float(x) * math.log(float(x)) * 1e6)) for x in spend)
    mu = float(spend.sum()) / float(n)
    ref = (float(sxl) / 1e6) / (float(n) * mu) - math.log(mu)
    assert int(out.n_users[0]) == n
    assert out.theil_t[0] == pytest.approx(ref, abs=1e-12)
    assert out.theil_t[0] >= 0.0
