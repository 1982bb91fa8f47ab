"""Independent recounts for the round-11 catalog additions
(gini_stump_split_gain, pinball_loss_p90_eval,
markov_stationary_behavior) — pure-Python references with the same
contracts, the per-round test discipline the earlier op families use.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from orca_ztbus_python_processor_spark.workloads.relational import (
    CATALOG as RCAT,
)
from orca_ztbus_python_processor_spark.workloads.timeseries import (
    CATALOG as TCAT,
    MARKOV_ROUNDS,
)

from tests.conftest import SMOKE_SF_DIR

SF_DIR = SMOKE_SF_DIR


def _rows(sql: str):
    return duckdb.sql(sql).fetchall()


def test_gini_stump_recount(spark):
    """Recompute every split's Gini gain from raw counts; pin the
    best-split invariants (gain >= 0 up to float noise is NOT implied
    by Gini in general for one-vs-rest, but the parent-minus-weighted
    decomposition must reproduce exactly)."""
    out = {
        (r["feature"], r["split_value"]): r
        for r in RCAT.queries["gini_stump_split_gain"](spark, SF_DIR).collect()
    }
    rows = _rows(
        f"SELECT l_linestatus, CAST(CAST(floor(l_quantity/10) AS INTEGER)"
        f" AS VARCHAR), CAST(quarter(l_shipdate) AS VARCHAR),"
        f" l_returnflag = 'R'"
        f" FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    n = len(rows)
    pos = sum(1 for r in rows if r[3])

    def gini(p, m):
        return 1.0 - (p / m) ** 2 - ((m - p) / m) ** 2

    feats = {"linestatus": 0, "qty_decade": 1, "ship_quarter": 2}
    for fname, fi in feats.items():
        cells: Counter = Counter()
        pcells: Counter = Counter()
        for r in rows:
            cells[r[fi]] += 1
            pcells[r[fi]] += bool(r[3])
        for v, nl in cells.items():
            pl = pcells[v]
            nr, pr = n - nl, pos - pl
            gain = (
                gini(pos, n)
                - (nl / n) * gini(pl, nl)
                - ((nr / n) * gini(pr, nr) if nr else 0.0)
            )
            got = out[(fname, v)]
            assert got["n_left"] == nl and got["pos_left"] == pl
            assert math.isclose(got["gini_gain"], gain, rel_tol=1e-6, abs_tol=1e-9)
    assert len(out) == sum(
        len({r[i] for r in rows}) for i in range(3)
    )


def test_pinball_loss_recount(spark):
    """Recompute the ceil-rank P90 per priority on the train half and
    the mean pinball loss on the test half."""
    out = {
        r["priority"]: r
        for r in RCAT.queries["pinball_loss_p90_eval"](spark, SF_DIR).collect()
    }
    rows = _rows(
        f"SELECT o_orderpriority, o_orderdate, o_totalprice, o_orderkey"
        f" FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    lo = min(r[1] for r in rows)
    hi = max(r[1] for r in rows)
    mid = lo + (hi - lo) / 2
    tau = 0.9
    train, test = defaultdict(list), defaultdict(list)
    for prio, d, y, k in rows:
        (train if d <= mid else test)[prio].append((y, k))
    for prio, items in train.items():
        items.sort()
        q = items[math.ceil(tau * len(items)) - 1][0]
        losses = [
            max(tau * (y - q), (tau - 1.0) * (y - q)) for y, _ in test[prio]
        ]
        r = out[prio]
        assert r["n_test"] == len(losses)
        assert math.isclose(r["q90_trained"], q, rel_tol=1e-6)
        assert math.isclose(
            r["mean_pinball_loss"], sum(losses) / len(losses), rel_tol=1e-5
        )
        assert r["mean_pinball_loss"] > 0  # predictor is not an oracle


def test_markov_stationary_recount(spark):
    """Replay the transition build and the f32-quantized power
    iteration; pin that the result is (a) a probability vector and
    (b) an approximate fixed point of P."""
    out = {
        r["event_type"]: r
        for r in TCAT.queries["markov_stationary_behavior"](
            spark, SF_DIR
        ).collect()
    }
    rows = _rows(
        f"SELECT user_id, event_type, ts, event_id"
        f" FROM read_parquet('{SF_DIR}/events.parquet')"
        f" ORDER BY user_id, ts, event_id"
    )
    trans: Counter = Counter()
    prev_by_user: dict = {}
    for uid, et, _, _ in rows:
        if uid in prev_by_user:
            trans[(prev_by_user[uid], et)] += 1
        prev_by_user[uid] = et
    states = sorted({s for s, _ in trans})
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    C = np.zeros((k, k), dtype=np.int64)
    for (s, d), c in trans.items():
        if d in idx:
            C[idx[s], idx[d]] += c
    P = C / C.sum(axis=1, keepdims=True)
    pi = np.full(k, 1.0 / k)
    for _ in range(MARKOV_ROUNDS):
        pi = (pi @ P).astype(np.float32).astype(np.float64)
    assert set(out) == set(states)
    for i, s in enumerate(states):
        assert out[s]["stationary_prob"] == np.float32(pi[i])
        assert out[s]["n_transitions_out"] == int(C[i].sum())
    total = sum(r["stationary_prob"] for r in out.values())
    assert math.isclose(total, 1.0, abs_tol=1e-4)
    # fixed point: another round moves pi by less than f32 resolution-ish
    nxt = pi @ P
    assert float(np.abs(nxt - pi).max()) < 1e-4
