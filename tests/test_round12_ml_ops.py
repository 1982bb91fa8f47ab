"""Round-12 ML-primitive queries pinned against independent pure-Python
references (pandas + hashlib), so a formula error replicated into the
DuckDB oracle cannot hide behind a clean differential: naive Bayes,
depth-2 tree induction, gains/lift deciles, IPS/SNIPS off-policy eval,
and the feature-hashing collision profile.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd
import pytest

from orca_ztbus_python_processor_spark.workloads.base import merged_catalog

from tests.conftest import ORACLE_SF_DIR

CATALOG = merged_catalog()


@pytest.fixture(scope="module")
def li() -> pd.DataFrame:
    df = pd.read_parquet(f"{ORACLE_SF_DIR}/lineitem.parquet")
    df["qd"] = (df["l_quantity"] // 10).astype(int).astype(str)
    df["sq"] = pd.to_datetime(df["l_shipdate"]).dt.quarter.astype(str)
    df["y"] = (df["l_returnflag"] == "R").astype(int)
    return df


_FEATS = {"linestatus": "l_linestatus", "qty_decade": "qd", "ship_quarter": "sq"}


def test_naive_bayes_matches_python_reference(spark, li):
    train = li[li["l_orderkey"] % 2 == 1]
    test = li[li["l_orderkey"] % 2 == 0]
    n_pos = int(train["y"].sum())
    n_neg = len(train) - n_pos

    lp = {}
    for feat, col in _FEATS.items():
        vocab = sorted(li[col].unique())
        vf = len(vocab)
        cnt = train.groupby(col)["y"].agg(["sum", "count"])
        for v in vocab:
            c_pos = int(cnt["sum"].get(v, 0))
            c_n = int(cnt["count"].get(v, 0))
            lp[(feat, v)] = (
                np.float32(math.log((c_pos + 1.0) / (n_pos + vf))),
                np.float32(math.log((c_n - c_pos + 1.0) / (n_neg + vf))),
            )
    lpr_pos = np.float32(math.log(n_pos / (n_pos + n_neg)))
    lpr_neg = np.float32(math.log(n_neg / (n_pos + n_neg)))

    cells: dict[tuple, list] = {}
    for _, row in test.iterrows():
        s_pos, s_neg = float(lpr_pos), float(lpr_neg)
        for feat, col in _FEATS.items():
            p, n = lp[(feat, row[col])]
            s_pos += float(p)
            s_neg += float(n)
        actual = "R" if row["y"] else "O"
        pred = "R" if s_pos > s_neg else "O"
        nop = "R" if (s_pos - float(lpr_pos)) > (s_neg - float(lpr_neg)) else "O"
        cells.setdefault((actual, pred, nop), []).append(s_pos - s_neg)

    got = {
        (r["actual"], r["predicted"], r["predicted_noprior"]): r
        for r in CATALOG.queries["naive_bayes_returnflag"](
            spark, ORACLE_SF_DIR
        ).collect()
    }
    assert set(got) == set(cells)
    for key, margins in cells.items():
        assert got[key]["n_rows"] == len(margins)
        assert got[key]["mean_margin"] == pytest.approx(
            float(np.mean(margins)), rel=1e-5
        )


def _gini_gain(n, pos, n_l, pos_l):
    def g(p, m):
        return 1.0 - (p / m) ** 2 - ((m - p) / m) ** 2

    n_r, pos_r = n - n_l, pos - pos_l
    right = 0.0 if n_r == 0 else (n_r / n) * g(pos_r, n_r)
    return g(pos, n) - (n_l / n) * g(pos_l, n_l) - right


def _best_stump(df: pd.DataFrame):
    n, pos = len(df), int(df["y"].sum())
    cand = []
    for feat, col in _FEATS.items():
        for v, grp in df.groupby(col):
            n_l, pos_l = len(grp), int(grp["y"].sum())
            cand.append(
                (-_gini_gain(n, pos, n_l, pos_l), feat, str(v), n_l, pos_l)
            )
    cand.sort()
    g0, feat, v, n_l, pos_l = cand[0]
    return {
        "feature": feat, "value": v, "n": n, "pos": pos,
        "n_left": n_l, "pos_left": pos_l, "gain": -g0,
    }


def test_tree_depth2_matches_python_reference(spark, li):
    root = _best_stump(li)
    mask = li[_FEATS[root["feature"]]].astype(str) == root["value"]
    expect = {
        "root": root,
        "left": _best_stump(li[mask]),
        "right": _best_stump(li[~mask]),
    }
    got = {
        r["node"]: r
        for r in CATALOG.queries["tree_depth2_returnflag"](
            spark, ORACLE_SF_DIR
        ).collect()
    }
    assert set(got) == {"root", "left", "right"}
    for node, e in expect.items():
        r = got[node]
        assert (r["feature"], r["split_value"]) == (e["feature"], e["value"]), node
        assert (r["n_node"], r["pos_node"]) == (e["n"], e["pos"]), node
        assert (r["n_split_left"], r["pos_split_left"]) == (
            e["n_left"], e["pos_left"],
        ), node
        assert r["gini_gain"] == pytest.approx(e["gain"], abs=1e-9)


def test_gains_lift_deciles_matches_python_reference(spark, li):
    train = li[li["l_orderkey"] % 2 == 1]
    cnt = train.groupby(["l_linestatus", "qd"])["y"].agg(["sum", "count"])
    test = li[li["l_orderkey"] % 2 == 0].copy()

    def score(row):
        try:
            c = cnt.loc[(row["l_linestatus"], row["qd"])]
            return (int(c["sum"]) + 1.0) / (int(c["count"]) + 2.0)
        except KeyError:
            return 1.0 / 2.0

    test["score"] = test.apply(score, axis=1)
    test = test.sort_values(
        by=["score", "l_orderkey", "l_linenumber", "y"],
        ascending=[False, True, True, True],
        kind="mergesort",
    ).reset_index(drop=True)
    n = len(test)
    q, rem = divmod(n, 10)
    sizes = [q + 1] * rem + [q] * (10 - rem)
    expect, start = [], 0
    for d, size in enumerate(sizes, start=1):
        chunk = test.iloc[start:start + size]
        expect.append((d, size, int(chunk["y"].sum())))
        start += size
    tot_pos = sum(p for _, _, p in expect)

    got = sorted(
        CATALOG.queries["gains_lift_deciles"](spark, ORACLE_SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    cum = 0
    for (d, size, pos), r in zip(expect, got):
        cum += pos
        assert r["decile"] == d
        assert r["n_rows"] == size
        assert r["n_pos"] == pos
        assert r["cum_pos"] == cum
        assert r["cum_gain_share"] == pytest.approx(cum / tot_pos, rel=1e-6)


def test_ips_offpolicy_matches_python_reference(spark):
    orders = pd.read_parquet(f"{ORACLE_SF_DIR}/orders.parquet")
    orders["ctx"] = pd.to_datetime(orders["o_orderdate"]).dt.quarter
    train = orders[orders["o_orderkey"] % 2 == 1]
    test = orders[orders["o_orderkey"] % 2 == 0]

    expect = {}
    for ctx, tgrp in train.groupby("ctx"):
        cells = tgrp.groupby("o_orderpriority")["o_totalprice"].agg(
            ["mean", "count"]
        )
        # f32-quantized mean argmax, ties by action name ascending
        best = sorted(
            ((-(np.float32(m)), a) for a, m in cells["mean"].items())
        )[0][1]
        c_ctx, c_cell = int(cells["count"].sum()), int(cells["count"][best])
        tst = test[test["ctx"] == ctx]
        w = np.where(
            tst["o_orderpriority"] == best, c_ctx / c_cell, 0.0
        )
        r = tst["o_totalprice"].to_numpy()
        sw, swr, sww = w.sum(), (w * r).sum(), (w * w).sum()
        expect[ctx] = {
            "chosen_action": best,
            "n_test": len(tst),
            "ips": swr / len(tst),
            "snips": swr / sw,
            "ess": sw * sw / sww,
        }

    got = {
        r["context_quarter"]: r
        for r in CATALOG.queries["ips_offpolicy_priority_eval"](
            spark, ORACLE_SF_DIR
        ).collect()
    }
    assert set(got) == set(expect)
    for ctx, e in expect.items():
        r = got[ctx]
        assert r["chosen_action"] == e["chosen_action"], ctx
        assert r["n_test"] == e["n_test"]
        assert r["ips_value"] == pytest.approx(e["ips"], rel=1e-5)
        assert r["snips_value"] == pytest.approx(e["snips"], rel=1e-5)
        assert r["effective_sample_size"] == pytest.approx(e["ess"], rel=1e-5)


def test_feature_hash_matches_python_reference(spark):
    docs = pd.read_parquet(f"{ORACLE_SF_DIR}/documents.parquet")
    occ: dict[str, int] = {}
    for text in docs["text"]:
        ts = re.findall(r"[a-z0-9]+", text.lower())
        for a, b in zip(ts, ts[1:]):
            g = f"{a} {b}"
            occ[g] = occ.get(g, 0) + 1
    buckets: dict[int, list] = {}
    for g, n in occ.items():
        b = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 256
        buckets.setdefault(b, []).append(n)
    hist: dict[int, list] = {}
    for members in buckets.values():
        hist.setdefault(len(members), []).append(sum(members))
    total = sum(occ.values())

    got = {
        r["grams_in_bucket"]: r
        for r in CATALOG.queries["feature_hash_collision_profile"](
            spark, ORACLE_SF_DIR
        ).collect()
    }
    assert set(got) == set(hist)
    for load, occs in hist.items():
        r = got[load]
        assert r["n_buckets"] == len(occs)
        assert r["n_occurrences"] == sum(occs)
        share = (sum(occs) / total) if load > 1 else 0.0
        assert r["collided_occurrence_share"] == pytest.approx(
            share, abs=1e-7
        )


def test_did_matches_python_reference(spark, li):
    part = pd.read_parquet(f"{ORACLE_SF_DIR}/part.parquet")
    df = li.merge(part[["p_partkey", "p_type"]],
                  left_on="l_partkey", right_on="p_partkey")
    ship = pd.to_datetime(df["l_shipdate"])
    lo, hi = ship.min(), ship.max()
    mid = lo + pd.Timedelta(days=(hi - lo).days // 2)
    df["treated"] = (df["p_type"] == "PROMO").astype(int)
    df["post"] = (ship > mid).astype(int)
    df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
    m = {
        (t, p): grp["rev"].mean()
        for (t, p), grp in df.groupby(["treated", "post"])
    }
    n = {
        (t, p): len(grp) for (t, p), grp in df.groupby(["treated", "post"])
    }
    did = (np.float32(m[(1, 1)]) - np.float32(m[(1, 0)])) - (
        np.float32(m[(0, 1)]) - np.float32(m[(0, 0)])
    )
    r = CATALOG.queries["did_promo_revenue_effect"](
        spark, ORACLE_SF_DIR
    ).collect()[0]
    assert (r["n_treat_pre"], r["n_treat_post"]) == (n[(1, 0)], n[(1, 1)])
    assert (r["n_ctrl_pre"], r["n_ctrl_post"]) == (n[(0, 0)], n[(0, 1)])
    for key, col in [
        ((1, 0), "mean_treat_pre"), ((1, 1), "mean_treat_post"),
        ((0, 0), "mean_ctrl_pre"), ((0, 1), "mean_ctrl_post"),
    ]:
        assert r[col] == pytest.approx(m[key], rel=1e-6)
    assert r["did_estimate"] == pytest.approx(float(did), abs=2e-2)


def test_km_matches_python_reference(spark):
    orders = pd.read_parquet(f"{ORACLE_SF_DIR}/orders.parquet")
    orders = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    mx = orders["o_orderdate"].max()
    obs = []
    for _, grp in orders.groupby("o_custkey"):
        dates = grp["o_orderdate"].tolist()
        t1 = dates[0]
        if len(dates) > 1:
            obs.append(((dates[1] - t1).days, 1))
        else:
            obs.append((((mx - t1)).days, 0))
    total = len(obs)
    from collections import Counter
    d_cnt, c_cnt = Counter(), Counter()
    for dur, ev in obs:
        (d_cnt if ev else c_cnt)[dur] += 1
    removed, surv, expect = 0, 1.0, {}
    for dur in sorted(set(d_cnt) | set(c_cnt)):
        n_risk = total - removed
        d = d_cnt.get(dur, 0)
        if d:
            surv *= 1.0 - d / n_risk
            expect[dur] = (n_risk, d, c_cnt.get(dur, 0), surv)
        removed += d + c_cnt.get(dur, 0)
    got = {
        r["duration_days"]: r
        for r in CATALOG.queries["km_repurchase_survival"](
            spark, ORACLE_SF_DIR
        ).collect()
    }
    assert set(got) == set(expect)
    for dur, (n_risk, d, c, surv) in expect.items():
        r = got[dur]
        assert r["n_risk"] == n_risk, dur
        assert r["n_events"] == d
        assert r["n_censored"] == c
        assert r["km_survival"] == pytest.approx(surv, abs=1e-6)


def test_anova2_matches_python_reference(spark, li):
    gm = li["l_quantity"].mean()
    am = li.groupby("l_returnflag")["l_quantity"].mean()
    bm = li.groupby("l_linestatus")["l_quantity"].mean()
    ssa = sum(
        len(g) * (g["l_quantity"].mean() - gm) ** 2
        for _, g in li.groupby("l_returnflag")
    )
    ssb = sum(
        len(g) * (g["l_quantity"].mean() - gm) ** 2
        for _, g in li.groupby("l_linestatus")
    )
    ssab = sum(
        len(g) * (g["l_quantity"].mean() - am[a] - bm[b] + gm) ** 2
        for (a, b), g in li.groupby(["l_returnflag", "l_linestatus"])
    )
    ssw = sum(
        ((g["l_quantity"] - g["l_quantity"].mean()) ** 2).sum()
        for _, g in li.groupby(["l_returnflag", "l_linestatus"])
    )
    n_cells = li.groupby(["l_returnflag", "l_linestatus"]).ngroups
    df_a = li["l_returnflag"].nunique() - 1
    df_b = li["l_linestatus"].nunique() - 1
    df_ab = n_cells - df_a - df_b - 1
    df_w = len(li) - n_cells
    r = CATALOG.queries["anova2_qty_flag_status"](
        spark, ORACLE_SF_DIR
    ).collect()[0]
    assert r["ss_flag"] == pytest.approx(ssa, rel=1e-5)
    assert r["ss_status"] == pytest.approx(ssb, rel=1e-5)
    assert r["ss_interaction"] == pytest.approx(ssab, rel=1e-4)
    assert r["ss_within"] == pytest.approx(ssw, rel=1e-6)
    assert (r["df_flag"], r["df_status"]) == (df_a, df_b)
    assert (r["df_interaction"], r["df_within"]) == (df_ab, df_w)
    assert r["f_flag"] == pytest.approx(
        (ssa / df_a) / (ssw / df_w), rel=1e-5
    )
    assert r["f_interaction"] == pytest.approx(
        (ssab / df_ab) / (ssw / df_w), rel=1e-4
    )


def test_paired_classifier_matches_python_reference(spark, li):
    score = 1.0 / (
        1.0 + np.exp(-(-3.0 + 30.0 * li["l_discount"] + 0.08 * li["l_quantity"]))
    )
    pa = (score.astype(np.float32) > np.float32(1.0 / 3.0)).astype(int)
    pb = (li["l_quantity"] >= 25).astype(int)
    y = li["y"]
    n = len(li)
    both = int(((pa == y) & (pb == y)).sum())
    only_a = int(((pa == y) & (pb != y)).sum())
    only_b = int(((pa != y) & (pb == y)).sum())
    neither = int(((pa != y) & (pb != y)).sum())
    agree = int((pa == pb).sum())
    pa1, pb1 = pa.sum() / n, pb.sum() / n
    pe = pa1 * pb1 + (1 - pa1) * (1 - pb1)
    po = agree / n
    r = CATALOG.queries["paired_classifier_agreement"](
        spark, ORACLE_SF_DIR
    ).collect()[0]
    assert (r["n_both_correct"], r["n_only_a"]) == (both, only_a)
    assert (r["n_only_b"], r["n_neither"]) == (only_b, neither)
    assert r["accuracy_a"] == pytest.approx((both + only_a) / n, rel=1e-6)
    assert r["accuracy_b"] == pytest.approx((both + only_b) / n, rel=1e-6)
    assert r["mcnemar_chi2"] == pytest.approx(
        (abs(only_a - only_b) - 1) ** 2 / (only_a + only_b), rel=1e-6
    )
    assert r["prediction_kappa"] == pytest.approx(
        (po - pe) / (1 - pe), rel=1e-5
    )


def test_ab_power_matches_python_reference(spark):
    orders = pd.read_parquet(f"{ORACLE_SF_DIR}/orders.parquet")
    z = 1.9599639845400545 + 0.8416212335729143
    got = {
        r["o_orderpriority"]: r
        for r in CATALOG.queries["ab_power_mde_by_priority"](
            spark, ORACLE_SF_DIR
        ).collect()
    }
    for prio, grp in orders.groupby("o_orderpriority"):
        n = len(grp)
        p = (grp["o_orderstatus"] == "F").mean()
        mde = z * math.sqrt(2 * p * (1 - p) / (n / 2.0))
        n_req = math.ceil(z * z * 2 * p * (1 - p) / (0.02 * 0.02))
        r = got[prio]
        assert r["n_orders"] == n
        assert r["base_rate"] == pytest.approx(p, rel=1e-6)
        assert r["mde_abs"] == pytest.approx(mde, rel=1e-6)
        assert r["n_required_per_arm"] == n_req


def test_jl_projection_matches_python_reference(spark):
    from orca_ztbus_python_processor_spark.workloads.vectors import (
        _JL_SIGNS,
        JL_TARGET_DIM,
    )

    emb = pd.read_parquet(f"{ORACLE_SF_DIR}/embeddings.parquet")
    signs = np.array(_JL_SIGNS, dtype=np.float64)  # k x d
    got = {
        r["vec_id"]: r
        for r in CATALOG.queries["jl_projection_distortion"](
            spark, ORACLE_SF_DIR
        ).collect()
    }
    assert len(got) == len(emb)
    # independently recompute for every vector
    for _, row in emb.iterrows():
        x = np.asarray(row["embedding"], dtype=np.float64)
        norm2 = float(x @ x)
        pnorm2 = float(((signs @ x) ** 2).sum())
        r = got[row["vec_id"]]
        assert r["l2_norm"] == pytest.approx(math.sqrt(norm2), rel=1e-6)
        assert r["distortion_ratio"] == pytest.approx(
            (pnorm2 / JL_TARGET_DIM) / norm2, rel=1e-5
        )
    # the sign matrix itself is balanced-ish (md5 parity): no row all
    # one sign — a corrupted generator would skew every ratio
    for srow in _JL_SIGNS:
        assert -len(srow) < sum(srow) < len(srow)


def test_logreg_matches_full_precision_newton(spark, li):
    X = np.column_stack(
        [np.ones(len(li)), li["l_discount"], li["l_quantity"] / 50.0]
    )
    y = li["y"].astype(float).to_numpy()
    b = np.zeros(3)
    for _ in range(3):
        p = 1 / (1 + np.exp(-X @ b))
        wv = p * (1 - p)
        b = b + np.linalg.solve((X * wv[:, None]).T @ X, X.T @ (y - p))
    p = 1 / (1 + np.exp(-X @ b))
    logloss = float(-(y * np.log(p) + (1 - y) * np.log(1 - p)).mean())
    acc = float(((p > 0.5) == y).mean())
    r = CATALOG.queries["logreg_newton_returnflag"](
        spark, ORACLE_SF_DIR
    ).collect()[0]
    assert r["n_rows"] == len(li)
    # f32 round-boundary quantization vs full-precision float64 Newton:
    # agreement to ~1e-5 relative is the designed envelope
    assert r["beta0"] == pytest.approx(b[0], rel=1e-4)
    assert r["beta1"] == pytest.approx(b[1], rel=1e-3)
    assert r["beta2"] == pytest.approx(b[2], rel=1e-3, abs=1e-4)
    assert r["train_logloss"] == pytest.approx(logloss, rel=1e-5)
    assert r["train_accuracy"] == pytest.approx(acc, abs=1e-6)
