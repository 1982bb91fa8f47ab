"""Independent-reference tests for the round-7 wave-3 operators:
each query's semantics are re-derived here from the raw parquet with
numpy/pandas/pure-Python — a second implementation that shares no code
with the Spark path (the DuckDB twin already guards SQL parity; this
file guards the DEFINITION).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from orca_ztbus_python_processor_spark.workloads.base import merged_catalog

from tests.conftest import SMOKE_SF_DIR

CAT = merged_catalog()


def test_chi_square_matches_numpy_contingency(spark):
    row = CAT.queries["chi_square_nation_segment"](spark, SMOKE_SF_DIR).collect()[0]
    cust = pd.read_parquet(f"{SMOKE_SF_DIR}/customer.parquet")
    tab = pd.crosstab(cust["c_nationkey"], cust["c_mktsegment"]).to_numpy(np.float64)
    n = tab.sum()
    exp = np.outer(tab.sum(axis=1), tab.sum(axis=0)) / n
    chi2 = float(((tab - exp) ** 2 / exp)[tab + exp > 0].sum())
    p = tab / n
    with np.errstate(divide="ignore", invalid="ignore"):
        mi_terms = p * np.log(p / (exp / n))
    mi = float(np.nansum(mi_terms))
    r, c = tab.shape
    assert row["n_customers"] == int(n)
    assert row["dof"] == (r - 1) * (c - 1)
    assert row["chi2"] == np.float32(chi2)
    assert row["mi_nats"] == np.float32(mi)
    assert row["cramers_v"] == np.float32(math.sqrt(chi2 / (n * min(r - 1, c - 1))))


def test_bfs_matches_pure_python_bfs(spark):
    rows = CAT.queries["copurchase_bfs_distance"](spark, SMOKE_SF_DIR).collect()
    li = pd.read_parquet(f"{SMOKE_SF_DIR}/lineitem.parquet")
    from collections import Counter, defaultdict, deque

    pair_counts: Counter = Counter()
    for parts in li.groupby("l_orderkey")["l_partkey"].unique():
        ps = sorted(set(parts))
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pair_counts[(a, b)] += 1
    adj = defaultdict(set)
    for (a, b), w in pair_counts.items():
        if w >= 2:
            adj[a].add(b)
            adj[b].add(a)
    seed = min(adj)
    dist = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        if dist[u] == 4:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    expect = Counter(dist.values())
    got = {r["hop"]: r["n_nodes"] for r in rows}
    assert got == dict(expect)
    by_hop = defaultdict(list)
    for node, h in dist.items():
        by_hop[h].append(node)
    for r in rows:
        assert r["min_node"] == min(by_hop[r["hop"]])
        assert r["max_node"] == max(by_hop[r["hop"]])


def test_robust_means_match_numpy(spark):
    rows = CAT.queries["robust_means_profile"](spark, SMOKE_SF_DIR).collect()
    li = pd.read_parquet(f"{SMOKE_SF_DIR}/lineitem.parquet")
    for r in rows:
        x = li.loc[li["l_returnflag"] == r["return_flag"], "l_extendedprice"].to_numpy(
            np.float64
        )
        assert r["n_items"] == len(x)
        assert r["mean_price"] == np.float32(x.mean())
        assert abs(r["geo_mean_price"] - math.exp(np.log(x).mean())) < 1e-2
        assert abs(r["harm_mean_price"] - len(x) / (1.0 / x).sum()) < 1e-2
        assert abs(r["rms_price"] - math.sqrt((x**2).mean())) < 1e-2
        assert r["midrange_price"] == np.float32((x.min() + x.max()) / 2)


def test_activity_bitmap_popcount_equals_distinct_days(spark):
    """The whole point of the bitmap: sum of popcounts per user MUST
    equal that user's count of distinct active dates — checked via an
    independent pandas nunique, plus the histogram reconciles to the
    full user population."""
    rows = CAT.queries["activity_bitmap_profile"](spark, SMOKE_SF_DIR).collect()
    ev = pd.read_parquet(f"{SMOKE_SF_DIR}/events.parquet")
    per_user = ev.groupby("user_id")["ts"].apply(lambda s: s.dt.date.nunique())
    expect = per_user.value_counts()
    got = {r["active_days"]: r["n_users"] for r in rows}
    assert got == {int(k): int(v) for k, v in expect.items()}
    assert sum(got.values()) == per_user.size
    for r in rows:
        users = per_user[per_user == r["active_days"]].index
        assert r["min_user"] == users.min()
        assert r["max_user"] == users.max()


def test_rolling_corr_matches_pandas(spark):
    out = (
        CAT.queries["rolling_corr_minute"](spark, SMOKE_SF_DIR)
        .toPandas()
        .sort_values("minute")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SMOKE_SF_DIR}/events.parquet")
    m = (
        ev.assign(
            minute=ev["ts"].dt.floor("min"),
            day=ev["ts"].dt.date,
            x=(ev["event_type"] == "click").astype(np.int64),
            y=(ev["event_type"] == "error").astype(np.int64),
        )
        .groupby(["day", "minute"])[["x", "y"]]
        .sum()
        .reset_index()
        .sort_values("minute")
        .reset_index(drop=True)
    )
    assert len(out) == len(m)
    assert (out["n_click"].to_numpy() == m["x"].to_numpy()).all()
    # pandas reference: per-day rolling corr over a 15-row window
    refs = []
    for _, g in m.groupby("day", sort=True):
        refs.append(
            g["x"].rolling(15, min_periods=1).corr(g["y"]).to_numpy(np.float64)
        )
    ref = np.concatenate(refs)
    got = out["corr_15m"].to_numpy(np.float64)
    # pandas emits NaN exactly where the engine (and the oracle) emit
    # NULL — zero variance or a 1-row frame; values must agree elsewhere
    mask = ~np.isnan(got)
    assert np.isnan(ref[~mask]).all()
    assert np.allclose(got[mask], ref[mask], atol=1e-6, equal_nan=False)


# ---- wave 4 -----------------------------------------------------------------


def test_boilerplate_share_matches_pandas(spark):
    rows = CAT.queries["boilerplate_shingle_share"](spark, SMOKE_SF_DIR).collect()
    docs = pd.read_parquet(f"{SMOKE_SF_DIR}/documents.parquet")
    K, S, MIN_DOCS = 12, 6, 5
    from collections import Counter

    per_doc = {}
    counts: Counter = Counter()
    for r in docs.itertuples():
        t = r.text
        shingles = {
            t[i : i + K] for i in range(0, max(len(t) - (K - 1), 1), S)
        }
        per_doc[r.doc_id] = (r.source, shingles)
        counts.update(shingles)
    boiler = {s for s, c in counts.items() if c >= MIN_DOCS}
    agg = {}
    for _doc, (src, sh) in per_doc.items():
        n_b = len(sh & boiler)
        d = agg.setdefault(src, [0, 0, 0, 0.0])
        d[0] += 1
        d[1] += len(sh)
        d[2] += n_b
        d[3] += n_b / len(sh)
    for r in rows:
        n_docs, n_sh, n_b, share_sum = agg[r["source"]]
        assert r["n_docs"] == n_docs
        assert r["n_shingles"] == n_sh
        assert r["n_boiler_shingles"] == n_b
        assert r["micro_share"] == np.float32(n_b / n_sh)
        assert abs(r["macro_share"] - share_sum / n_docs) < 1e-6
    assert {r["source"] for r in rows} == set(agg)


def test_label_separation_matches_numpy(spark):
    rows = CAT.queries["label_separation_matrix"](spark, SMOKE_SF_DIR).collect()
    emb = pd.read_parquet(f"{SMOKE_SF_DIR}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    labels = emb["label"].to_numpy()
    cents = {
        int(lab): X[labels == lab].mean(axis=0) for lab in np.unique(labels)
    }
    n_labels = len(cents)
    assert len(rows) == n_labels * (n_labels - 1) // 2
    for r in rows:
        ca, cb = cents[r["label_a"]], cents[r["label_b"]]
        ref = float(ca @ cb / (np.linalg.norm(ca) * np.linalg.norm(cb)))
        assert abs(r["centroid_cosine"] - ref) < 1e-6, (r, ref)


def test_daily_kl_matches_numpy(spark):
    rows = CAT.queries["daily_mix_kl_anomaly"](spark, SMOKE_SF_DIR).collect()
    ev = pd.read_parquet(f"{SMOKE_SF_DIR}/events.parquet")
    ev = ev.assign(day=ev["ts"].dt.floor("D"))
    g = ev.groupby(["day", "event_type"]).size()
    q = ev["event_type"].value_counts(normalize=True)
    for r in rows:
        day = pd.Timestamp(r["day"])
        sub = g.loc[day]
        p = sub / sub.sum()
        ref = float((p * np.log(p / q.loc[p.index])).sum())
        assert r["n_events"] == int(sub.sum())
        assert abs(r["kl_nats"] - ref) < 1e-6, (day, r["kl_nats"], ref)
    assert len(rows) == ev["day"].nunique()


def test_orderkey_audit_matches_numpy(spark):
    row = CAT.queries["orderkey_sequence_audit"](spark, SMOKE_SF_DIR).collect()[0]
    keys = np.sort(
        pd.read_parquet(f"{SMOKE_SF_DIR}/orders.parquet")["o_orderkey"].unique()
    )
    n_islands = int((np.diff(keys) > 1).sum()) + 1
    assert row["n_keys"] == len(keys)
    assert row["n_islands"] == n_islands
    assert row["min_key"] == keys[0] and row["max_key"] == keys[-1]
    assert row["coverage"] == np.float32(len(keys) / (keys[-1] - keys[0] + 1))


# ---- wave 5 -----------------------------------------------------------------


def test_zlib_ratio_matches_stdlib(spark):
    import zlib

    rows = CAT.queries["text_zlib_compress_ratio"](spark, SMOKE_SF_DIR).collect()
    docs = pd.read_parquet(f"{SMOKE_SF_DIR}/documents.parquet")
    for r in rows:
        sub = docs.loc[docs["source"] == r["source"], "text"]
        ratios = np.array(
            [
                len(zlib.compress(t.encode("utf-8"), 6)) / len(t.encode("utf-8"))
                for t in sub
            ]
        )
        assert r["n_docs"] == len(sub)
        assert abs(r["mean_ratio"] - ratios.mean()) < 1e-6
        assert r["min_ratio"] == np.float32(ratios.min())
        assert r["max_ratio"] == np.float32(ratios.max())
        assert r["n_redundant"] == int((ratios < 0.35).sum())
    assert {r["source"] for r in rows} == set(docs["source"].unique())


def test_quantile_sketch_rank_guarantee(spark):
    """The sketch's contract: an estimate's true rank may deviate from
    the target rank by at most (k-1) per partition — with k = max_block
    from the sketch itself, the bound is n_partitions * (max_block - 1).
    Also: total weight must reconcile to the exact row count, and the
    estimate must be an actual data value (block maxima are observed
    points, not interpolations)."""
    rows = CAT.queries["quantile_sketch_profile"](spark, SMOKE_SF_DIR).collect()
    ev = pd.read_parquet(f"{SMOKE_SF_DIR}/events.parquet")
    v = np.sort(ev["value"].to_numpy(np.float64))
    n = len(v)
    vals = set(v.astype(np.float32).tolist())  # estimates exit at f32
    n_parts = max(spark.sparkContext.defaultParallelism, 2)
    for r in rows:
        assert r["n_rows"] == n
        bound = n_parts * (r["max_block"] - 1) + r["max_block"]
        true_rank = np.searchsorted(v, r["estimate"], side="right") - 1
        target = r["q"] * (r["n_rows"] - 1)
        assert abs(true_rank - target) <= bound, (
            r["q"], true_rank, target, bound,
        )
        assert np.float32(r["estimate"]) in vals


# ---- wave 6 -----------------------------------------------------------------


def test_neardup_canonical_keep_matches_union_find(spark):
    """Independent reference: char-shingle Jaccard pairs + union-find +
    longest-doc keeper in pure Python, against the full Spark pipeline
    (exact pair stage -> distributed CC -> struct-max keeper)."""
    rows = CAT.queries["text_neardup_canonical_keep"](spark, SMOKE_SF_DIR).collect()
    docs = pd.read_parquet(f"{SMOKE_SF_DIR}/documents.parquet")
    K, S, T = 20, 10, 0.5
    sets = {}
    for r in docs.itertuples():
        t = r.text
        sets[r.doc_id] = {
            t[i : i + K] for i in range(0, max(len(t) - (K - 1), 1), S)
        }
    ids = sorted(sets)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i_idx, a in enumerate(ids):
        for b in ids[i_idx + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter and inter / (len(sets[a]) + len(sets[b]) - inter) >= T:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for i in ids:
        clusters.setdefault(find(i), []).append(i)
    nchars = docs.set_index("doc_id")["n_chars"].to_dict()
    expect = {}
    for root, members in clusters.items():
        if len(members) < 2:
            continue
        comp = min(members)
        keep = min(members, key=lambda d: (-nchars[d], d))
        expect[comp] = (
            len(members),
            sum(nchars[d] for d in members),
            keep,
            nchars[keep],
        )
    got = {
        r["component"]: (
            r["n_members"], r["total_chars"], r["keep_doc_id"], r["kept_chars"]
        )
        for r in rows
    }
    assert got == expect
    for r in rows:
        assert r["chars_drop_share"] == np.float32(
            1.0 - r["kept_chars"] / r["total_chars"]
        )
