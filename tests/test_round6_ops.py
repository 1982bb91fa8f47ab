"""Independent-reference tests for the round-6 operator wave: each new
query is checked on RANDOM seeded data against a brute-force numpy /
pandas implementation of its definition — a second oracle besides the
DuckDB twin (which runs only on the driver fixture), per SURVEY.md §5
strategy #2 (property/differential testing on generated inputs).
"""

from __future__ import annotations

import datetime as dt
import itertools

import numpy as np
import pandas as pd
import pytest

from orca_ztbus_python_processor_spark.workloads.base import merged_catalog

CAT = merged_catalog()
RNG_SEED = 20260814


def _write(tmp_path, name, pdf):
    pdf.to_parquet(str(tmp_path / f"{name}.parquet"), index=False)


def _events_frame(n=600, users=12, seed=RNG_SEED):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 3, 1)
    ts = [
        base + dt.timedelta(seconds=int(s))
        for s in np.sort(rng.integers(0, 86_400, n))
    ]
    return pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": pd.to_datetime(ts),
            "user_id": rng.integers(1, users + 1, n).astype(np.int64),
            "event_type": rng.choice(
                ["view", "click", "purchase", "error", "signup"], n
            ),
            "value": rng.normal(50, 20, n),
            "props": ["{}"] * n,
        }
    )


# ---------------------------------------------------------------------------
# graph: triangle census
# ---------------------------------------------------------------------------


def test_triangle_census_matches_bruteforce(spark, tmp_path):
    rng = np.random.default_rng(RNG_SEED)
    rows = []
    for ok in range(1, 81):
        parts = rng.choice(np.arange(1, 25), size=rng.integers(1, 6), replace=False)
        for i, p in enumerate(parts):
            rows.append((ok, int(p), i + 1, 1.0, 10.0, 0.0, 0.0))
    li = pd.DataFrame(
        rows,
        columns=[
            "l_orderkey", "l_partkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        ],
    )
    _write(tmp_path, "lineitem", li)

    # reference: recurrent (>=2 orders) co-purchase graph, oriented by
    # (degree, id), wedge + closing-probe census straight from the
    # definition
    from collections import Counter, defaultdict

    w = Counter()
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(set(grp["l_partkey"]))
        for a, b in itertools.combinations(ps, 2):
            w[(a, b)] += 1
    edges = {e for e, c in w.items() if c >= 2}
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    out = defaultdict(list)
    for a, b in edges:
        src, dst = (a, b) if (deg[a], a) < (deg[b], b) else (b, a)
        out[src].append(dst)
    n_wedges = sum(len(v) * (len(v) - 1) // 2 for v in out.values())
    und = {frozenset(e) for e in edges}
    n_tri = sum(
        1
        for v in out.values()
        for x, y in itertools.combinations(sorted(v), 2)
        if frozenset((x, y)) in und
    )

    got = CAT.queries["copurchase_triangle_count"](spark, str(tmp_path)).collect()[0]
    assert got["n_edges"] == len(edges)
    assert got["n_wedges"] == n_wedges
    assert got["n_triangles"] == n_tri

    # VERDICT r6 #3: beyond broadcast_nodes_limit the degree enrich
    # joins must fall back to shuffle joins and return IDENTICAL
    # results (the pagerank threshold/fallback duality).
    from orca_ztbus_python_processor_spark.workloads.relational import (
        copurchase_triangle_count,
    )

    fb = copurchase_triangle_count(
        spark, str(tmp_path), broadcast_nodes_limit=0
    ).collect()[0]
    assert (fb["n_edges"], fb["n_wedges"], fb["n_triangles"]) == (
        got["n_edges"], got["n_wedges"], got["n_triangles"],
    )


# ---------------------------------------------------------------------------
# skyline
# ---------------------------------------------------------------------------


def test_skyline_matches_dominance_bruteforce(spark, tmp_path):
    rng = np.random.default_rng(RNG_SEED)
    n = 400
    dates = pd.to_datetime(
        [dt.datetime(2024, 1, 1) + dt.timedelta(days=int(d)) for d in rng.integers(0, 25, n)]
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, n + 1, dtype=np.int64),
            "o_custkey": np.ones(n, dtype=np.int64),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": np.round(rng.uniform(100, 10_000, n), 2),
            "o_orderdate": dates,
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )
    _write(tmp_path, "orders", orders)

    d = orders["o_orderdate"].to_numpy()
    p = orders["o_totalprice"].to_numpy()
    keep = []
    for i in range(n):
        dominated = bool(
            np.any(
                (d <= d[i]) & (p >= p[i]) & ((d < d[i]) | (p > p[i]))
            )
        )
        if not dominated:
            keep.append(int(orders["o_orderkey"].iloc[i]))

    got = sorted(
        r["o_orderkey"]
        for r in CAT.queries["orders_skyline_paretofront"](spark, str(tmp_path)).collect()
    )
    assert got == sorted(keep)


# ---------------------------------------------------------------------------
# penny allocation
# ---------------------------------------------------------------------------


def test_penny_allocation_matches_reference_and_bounds(spark, tmp_path):
    rng = np.random.default_rng(RNG_SEED)
    li_rows, o_rows = [], []
    for ok in range(1, 61):
        n_lines = int(rng.integers(1, 8))
        exts = np.round(rng.uniform(1, 5_000, n_lines), 2)
        total = float(np.round(exts.sum() * rng.uniform(0.9, 1.3), 2))
        o_rows.append((ok, 1, "O", total, dt.datetime(2024, 1, 1), "1-URGENT"))
        for i, e in enumerate(exts):
            li_rows.append((ok, 1, i + 1, 1.0, float(e), 0.0, 0.0))
    _write(
        tmp_path,
        "lineitem",
        pd.DataFrame(
            li_rows,
            columns=[
                "l_orderkey", "l_partkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            ],
        ),
    )
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            o_rows,
            columns=[
                "o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderdate", "o_orderpriority",
            ],
        ),
    )

    got = (
        CAT.queries["order_penny_allocation"](spark, str(tmp_path))
        .toPandas()
        .set_index(["l_orderkey", "l_linenumber"])["alloc_cents"]
    )

    for ok, _, _, total, _, _ in o_rows:
        total_c = int(round(total * 100))
        lines = [(ln, e) for (o, _, ln, _, e, _, _) in li_rows if o == ok]
        ext_c = {ln: int(round(e * 100)) for ln, e in lines}
        sum_c = sum(ext_c.values())
        floor_c = {ln: (total_c * c) // sum_c for ln, c in ext_c.items()}
        rem = {ln: (total_c * c) % sum_c for ln, c in ext_c.items()}
        residue = total_c - sum(floor_c.values())
        order = sorted(ext_c, key=lambda ln: (-rem[ln], ln))
        expect = {
            ln: floor_c[ln] + (1 if i < residue else 0)
            for i, ln in enumerate(order)
        }
        for ln, want in expect.items():
            have = int(got.loc[(ok, ln)])
            assert have == want, (ok, ln, have, want)
            # largest-remainder shares are within one cent of exact
            assert abs(have - total_c * ext_c[ln] / sum_c) < 1.0 + 1e-9
        assert sum(expect.values()) == total_c


# ---------------------------------------------------------------------------
# weighted quantiles (operator-level, no fixture dir needed)
# ---------------------------------------------------------------------------


def test_weighted_quantiles_matches_numpy(spark):
    from orca_ztbus_python_processor_spark.functions.quantiles import (
        exact_weighted_quantiles,
    )

    rng = np.random.default_rng(RNG_SEED)
    v = np.round(rng.uniform(0, 1_000, 5_000), 3)
    w = rng.integers(1, 50, 5_000).astype(float)
    df = spark.createDataFrame(pd.DataFrame({"v": v, "w": w}))
    qs = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    got = {
        r["q"]: r["wq"]
        for r in exact_weighted_quantiles(df, "v", "w", qs=qs).collect()
    }
    order = np.argsort(v, kind="stable")
    sv, cw = v[order], np.cumsum(w[order])
    W = cw[-1]
    for q in qs:
        idx = int(np.searchsorted(cw, q * W, side="left"))
        assert got[q] == pytest.approx(np.float32(sv[idx]), rel=0, abs=0)


# ---------------------------------------------------------------------------
# rolling median / CUSUM / interval coverage / funnel on random events
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("r6events")
    _write(p, "events", _events_frame())
    return p


def test_rolling_median_matches_pandas(spark, events_dir):
    ev = _events_frame().sort_values(["user_id", "ts", "event_id"])
    ref = (
        ev.groupby("user_id")["value"]
        .rolling(7, min_periods=1)
        .median()
        .reset_index(level=0, drop=True)
    )
    expect = dict(zip(ev["event_id"], np.float32(ref)))
    got = CAT.queries["rolling_median_value"](spark, str(events_dir)).collect()
    assert len(got) == len(ev)
    for r in got:
        assert r["roll_median"] == pytest.approx(expect[r["event_id"]], rel=1e-6)


def test_cusum_matches_pandas(spark, events_dir):
    ev = _events_frame().sort_values(["user_id", "ts", "event_id"])
    got = {
        r["user_id"]: r
        for r in CAT.queries["value_cusum_changepoint"](spark, str(events_dir)).collect()
    }
    for uid, grp in ev.groupby("user_id"):
        dev = grp["value"] - grp["value"].mean()
        cusum = dev.cumsum().to_numpy()
        i = int(np.argmax(np.abs(cusum)))  # first max in (ts, event_id) order
        r = got[uid]
        assert r["n_events"] == len(grp)
        assert r["max_abs_cusum"] == pytest.approx(
            np.float32(abs(cusum[i])), rel=1e-5
        )
        assert r["changepoint_ts"] == grp["ts"].iloc[i].to_pydatetime()


def test_interval_coverage_matches_reference(spark, events_dir):
    from orca_ztbus_python_processor_spark.workloads.timeseries import (
        INTERVAL_SECONDS,
    )

    ev = _events_frame().sort_values(["user_id", "ts", "event_id"])
    got = {
        r["user_id"]: r
        for r in CAT.queries["user_interval_coverage"](spark, str(events_dir)).collect()
    }
    us = 1_000_000
    for uid, grp in ev.groupby("user_id"):
        starts = (grp["ts"].astype("int64") // 1000).to_numpy()  # ns -> us
        islands = []
        cur_s, cur_e = None, None
        for s in starts:
            e = s + INTERVAL_SECONDS * us
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    islands.append((cur_s, cur_e))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        islands.append((cur_s, cur_e))
        covered = sum(e - s for s, e in islands)
        span = islands[-1][1] - islands[0][0]
        r = got[uid]
        assert r["n_islands"] == len(islands)
        assert r["covered_us"] == covered
        assert r["span_us"] == span


def test_funnel_matches_reference(spark, events_dir):
    ev = _events_frame()
    hour = pd.Timedelta(hours=1)
    v = ev[ev.event_type == "view"].groupby("user_id")["ts"].min()
    c = {}
    for uid, t0 in v.items():
        cand = ev[
            (ev.user_id == uid)
            & (ev.event_type == "click")
            & (ev.ts > t0)
            & (ev.ts <= t0 + hour)
        ]
        if len(cand):
            c[uid] = cand["ts"].min()
    p = 0
    for uid, t1 in c.items():
        cand = ev[
            (ev.user_id == uid)
            & (ev.event_type == "purchase")
            & (ev.ts > t1)
            & (ev.ts <= t1 + hour)
        ]
        if len(cand):
            p += 1
    got = {
        r["stage_name"]: r["n_users"]
        for r in CAT.queries["funnel_time_constrained"](spark, str(events_dir)).collect()
    }
    assert got == {"view": len(v), "click_1h": len(c), "purchase_1h": p}


# ---------------------------------------------------------------------------
# bloom prefilter: equals the plain join on random data
# ---------------------------------------------------------------------------


def test_bloom_join_equals_plain_join_random(spark, tmp_path):
    rng = np.random.default_rng(RNG_SEED)
    n_orders = 500
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, n_orders + 1, dtype=np.int64),
            "o_custkey": np.ones(n_orders, dtype=np.int64),
            "o_orderstatus": ["O"] * n_orders,
            "o_totalprice": rng.uniform(100, 1000, n_orders),
            "o_orderdate": pd.to_datetime([dt.datetime(2024, 1, 1)] * n_orders),
            "o_orderpriority": rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM"], n_orders
            ),
        }
    )
    n_li = 3_000
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(1, n_orders + 1, n_li).astype(np.int64),
            "l_partkey": np.ones(n_li, dtype=np.int64),
            "l_linenumber": np.arange(n_li, dtype=np.int64) % 7 + 1,
            "l_quantity": np.ones(n_li),
            "l_extendedprice": np.round(rng.uniform(1, 100, n_li), 2),
            "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
            "l_tax": np.zeros(n_li),
            "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        }
    )
    _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)

    urgent = set(orders.loc[orders.o_orderpriority == "1-URGENT", "o_orderkey"])
    sel = li[li.l_orderkey.isin(urgent)]
    ref = (
        sel.assign(rev=sel.l_extendedprice * (1 - sel.l_discount))
        .groupby("l_returnflag")
        .agg(n_items=("rev", "size"), revenue=("rev", "sum"))
    )
    got = {
        r["return_flag"]: (r["n_items"], r["revenue"])
        for r in CAT.queries["bloom_prefiltered_join"](spark, str(tmp_path)).collect()
    }
    assert set(got) == set(ref.index)
    for flag, row in ref.iterrows():
        n, rev = got[flag]
        assert n == row["n_items"]
        assert rev == pytest.approx(np.float32(row["revenue"]), rel=1e-6)


# ---------------------------------------------------------------------------
# equi-depth histogram / PSI structural properties (driver fixture)
# ---------------------------------------------------------------------------


def test_equidepth_bucket_sizes_differ_by_at_most_one(spark):
    from tests.conftest import SMOKE_SF_DIR

    rows = CAT.queries["value_histogram_equidepth"](spark, SMOKE_SF_DIR).collect()
    sizes = [r["n"] for r in rows]
    assert len(rows) == 10
    assert max(sizes) - min(sizes) <= 1
    # bucket value ranges are ordered and non-overlapping
    by_bucket = sorted(rows, key=lambda r: r["bucket"])
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a["hi"] <= b["lo"] + 1e-6


def test_psi_full_grid_finite_terms(spark):
    from tests.conftest import SMOKE_SF_DIR

    rows = CAT.queries["value_psi_drift"](spark, SMOKE_SF_DIR).collect()
    assert sorted(r["bin"] for r in rows) == list(range(10))
    for r in rows:
        assert np.isfinite(r["psi_term"])
        assert np.isfinite(r["share_shift"])
    # smoothing guarantees psi_term >= 0 is NOT implied (terms signed);
    # but the TOTAL is >= 0 by Gibbs' inequality on the smoothed shares
    assert sum(r["psi_term"] for r in rows) >= -1e-9


# ---------------------------------------------------------------------------
# hypothesis: weighted quantiles on arbitrary integer-weighted inputs
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.floats(-1e6, 1e6, allow_nan=False, width=32),
            st.integers(1, 100),
        ),
        min_size=1,
        max_size=300,
    ),
    q=st.sampled_from([0.01, 0.25, 0.5, 0.75, 0.99, 1.0]),
)
def test_weighted_quantile_hypothesis(spark, data, q):
    from orca_ztbus_python_processor_spark.functions.quantiles import (
        exact_weighted_quantiles,
    )

    v = np.array([x for x, _ in data], dtype=float)
    w = np.array([y for _, y in data], dtype=float)
    df = spark.createDataFrame(pd.DataFrame({"v": v, "w": w}))
    got = exact_weighted_quantiles(df, "v", "w", qs=(q,)).collect()
    order = np.argsort(v, kind="stable")
    sv, cw = v[order], np.cumsum(w[order])
    idx = int(np.searchsorted(cw, q * cw[-1], side="left"))
    idx = min(idx, len(sv) - 1)
    assert len(got) == 1
    assert got[0]["wq"] == np.float32(sv[idx])


def test_weighted_quantile_fractional_weights_never_drop_a_quantile(spark):
    """ADVICE r6: with NON-integer weights, float rounding can leave
    every partition's prefix sum just short of q * total_weight; the
    holder scan must fall back to the last partition so the quantile
    is still emitted (q=1.0 must return the max value)."""
    from orca_ztbus_python_processor_spark.functions.quantiles import (
        exact_weighted_quantiles,
    )

    rows = [(float(i), 0.1) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "x double, w double").repartition(8)
    out = {
        r["q"]: r["wq"]
        for r in exact_weighted_quantiles(
            df, "x", "w", qs=(0.5, 0.99, 1.0)
        ).collect()
    }
    assert set(out) == {0.5, 0.99, 1.0}, out
    assert out[1.0] == 200.0


def test_weighted_quantile_tiny_legit_gap_not_absorbed_by_epsilon(spark):
    """ADVICE r7: the old flat 1e-9 * total_weight tolerance could
    select the PRECEDING value when a cumulative weight legitimately
    (not by rounding) sat within eps below the target. Two rows with
    weights (0.5 - 5e-10, 0.5 + 5e-10): the q=0.5 lower weighted
    quantile is the SECOND value — the first row's cumulative weight
    genuinely misses the target by 5e-10, which the flat epsilon
    absorbed but the accumulated-error-scaled one must not."""
    from orca_ztbus_python_processor_spark.functions.quantiles import (
        exact_weighted_quantiles,
    )

    rows = [(1.0, 0.5 - 5e-10), (2.0, 0.5 + 5e-10)]
    df = spark.createDataFrame(rows, "x double, w double")
    got = exact_weighted_quantiles(df, "x", "w", qs=(0.5,)).collect()
    assert len(got) == 1
    assert got[0]["wq"] == 2.0, got


def test_weighted_quantile_integer_weights_exact_selection(spark):
    """Integer-valued weights ride the eps = 0 path: cumulative sums
    are exact in doubles, so a cw exactly AT the target selects and
    one unit below does not — no tolerance smearing."""
    from orca_ztbus_python_processor_spark.functions.quantiles import (
        exact_weighted_quantiles,
    )

    # cw: 3, 7, 10; q=0.3 -> target 3.0 exactly => first value
    rows = [(10.0, 3.0), (20.0, 4.0), (30.0, 3.0)]
    df = spark.createDataFrame(rows, "x double, w double")
    out = {
        r["q"]: r["wq"]
        for r in exact_weighted_quantiles(
            df, "x", "w", qs=(0.3, 0.31)
        ).collect()
    }
    assert out[0.3] == 10.0
    assert out[0.31] == 20.0
