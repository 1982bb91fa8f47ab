"""Independent numpy/pandas/pure-python references for the round-8
catalog wave — the DuckDB twins share SQL-level blind spots with the
Spark implementations (the chi-square lesson of round 6), so every new
operator also gets a from-scratch reference on the seeded sf0.001
fixture here.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from orca_ztbus_python_processor_spark.workloads.base import merged_catalog

from tests.conftest import SMOKE_SF_DIR

CAT = merged_catalog()


def _docs_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SMOKE_SF_DIR}/documents.parquet")


def _events_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SMOKE_SF_DIR}/events.parquet")


def test_decontam_matches_pure_python(spark):
    import re

    docs = _docs_pdf()
    grams: dict[int, set] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = re.findall(r"[a-z0-9]+", text.lower())
        n = max(len(toks) - 12, 1)
        grams[doc_id] = {" ".join(toks[i : i + 13]) for i in range(n)}
    bench: set = set()
    for doc_id, g in grams.items():
        if doc_id % 97 == 0:
            bench |= g
    per_source = defaultdict(lambda: [0, 0, 0, 0, 0])  # docs, any, 5pct, hits, grams
    for doc_id, source in zip(docs["doc_id"], docs["source"]):
        if doc_id % 97 == 0:
            continue
        g = grams[doc_id]
        hits = len(g & bench)
        st = per_source[source]
        st[0] += 1
        st[1] += hits > 0
        st[2] += hits >= 0.05 * len(g)
        st[3] += hits
        st[4] += len(g)
    got = {
        r["source"]: r
        for r in CAT.queries["benchmark_decontam_13gram"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert set(got) == set(per_source)
    for src, (nd, na, n5, hits, ngrams) in per_source.items():
        r = got[src]
        assert (r["n_train_docs"], r["n_flagged_any"], r["n_flagged_5pct"]) == (
            nd, na, n5,
        ), src
        assert r["micro_hit_rate"] == pytest.approx(hits / ngrams, rel=1e-6)


def test_prefix_template_matches_pandas(spark):
    docs = _docs_pdf()
    docs["prefix"] = docs["text"].str.slice(0, 64)
    sizes = docs.groupby("prefix")["doc_id"].count()
    docs["cluster_size"] = docs["prefix"].map(sizes)
    got = {
        r["source"]: r
        for r in CAT.queries["doc_prefix_template_profile"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    for src, grp in docs.groupby("source"):
        r = got[src]
        assert r["n_docs"] == len(grp)
        assert r["n_distinct_prefixes"] == grp["prefix"].nunique()
        assert r["n_templated_docs"] == int((grp["cluster_size"] > 1).sum())
        assert r["max_cluster_size"] == int(grp["cluster_size"].max())


def test_bigram_entropy_matches_counter(spark):
    docs = _docs_pdf()
    got = {
        r["source"]: r
        for r in CAT.queries["char_bigram_entropy_by_source"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    for src, grp in docs.groupby("source"):
        c: Counter = Counter()
        for text in grp["text"]:
            n = max(len(text) - 1, 1)
            for i in range(n):
                c[text[i : i + 2]] += 1
        total = sum(c.values())
        h = -sum(v / total * math.log2(v / total) for v in c.values())
        r = got[src]
        assert r["n_bigrams"] == total
        assert r["n_distinct_bigrams"] == len(c)
        assert r["entropy_bits"] == pytest.approx(h, rel=1e-6)


def test_mahalanobis_matches_numpy(spark):
    emb = pd.read_parquet(f"{SMOKE_SF_DIR}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    m = X.mean(axis=0)
    var = (X * X).mean(axis=0) - m * m
    dist = (((X - m) ** 2) / var).sum(axis=1)
    labels = emb["label"].to_numpy()
    got = {
        r["label"]: r
        for r in CAT.queries["embedding_outlier_mahalanobis"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    for lab in np.unique(labels):
        d = dist[labels == lab]
        r = got[int(lab)]
        assert r["n_vectors"] == len(d)
        assert r["n_outliers"] == int((d > 96.0).sum())
        assert r["mean_dist"] == pytest.approx(float(d.mean()), rel=1e-5)
        assert r["max_dist"] == pytest.approx(float(d.max()), rel=1e-5)


def test_jaccard_parts_matches_pure_python(spark):
    li = pd.read_parquet(f"{SMOKE_SF_DIR}/lineitem.parquet")
    pair_count: Counter = Counter()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"]))
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pair_count[(parts[i], parts[j])] += 1
    edges = {p for p, c in pair_count.items() if c >= 2}
    nbrs: dict[int, set] = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    scored = []
    seen = set()
    for u, nu in nbrs.items():
        for a in nu:
            for b in nu:
                if a < b and (a, b) not in seen:
                    seen.add((a, b))
                    common = len(nbrs[a] & nbrs[b])
                    if common:
                        j = common / (len(nbrs[a]) + len(nbrs[b]) - common)
                        scored.append((-j, a, b, common))
    scored.sort()
    expect = scored[:20]
    rows = CAT.queries["copurchase_jaccard_similar_parts"](
        spark, SMOKE_SF_DIR
    ).collect()
    assert len(rows) == min(20, len(expect))
    for r, (negj, a, b, common) in zip(rows, expect):
        assert (r["part_a"], r["part_b"], r["n_common"]) == (a, b, common)
        assert r["jaccard"] == pytest.approx(-negj, rel=1e-6)
        assert (r["deg_a"], r["deg_b"]) == (len(nbrs[a]), len(nbrs[b]))


def test_epoch_shuffle_matches_python_hash(spark):
    docs = _docs_pdf()
    got = {
        r["epoch"]: r
        for r in CAT.queries["epoch_shuffle_balance"](spark, SMOKE_SF_DIR).collect()
    }
    for epoch in range(4):
        sizes: Counter = Counter()
        for doc_id in docs["doc_id"]:
            shard = ((int(doc_id) + epoch * 1000003) * 2654435761) % 1048576 % 16
            sizes[shard] += 1
        r = got[epoch]
        assert r["n_docs"] == len(docs)
        assert r["n_shards_used"] == len(sizes)
        assert (r["min_shard"], r["max_shard"]) == (
            min(sizes.values()), max(sizes.values()),
        )
        c = np.array(list(sizes.values()), dtype=float)
        cv = math.sqrt((c * c).mean() - c.mean() ** 2) / c.mean()
        assert r["shard_cv"] == pytest.approx(cv, abs=1e-6)


def test_mutual_information_matches_numpy(spark):
    ev = _events_pdf()
    ts = pd.to_datetime(ev["ts"], utc=True)
    dow = ts.dt.dayofweek  # Monday=0
    dow_sunday0 = (dow + 1) % 7  # Sunday=0 convention of the query
    tab = pd.crosstab(ev["event_type"], dow_sunday0).to_numpy(dtype=float)
    n = tab.sum()
    pt = tab.sum(axis=1) / n
    pdw = tab.sum(axis=0) / n
    mi = 0.0
    for i in range(tab.shape[0]):
        for j in range(tab.shape[1]):
            if tab[i, j] > 0:
                p = tab[i, j] / n
                mi += p * math.log2(p / (pt[i] * pdw[j]))
    h_t = -sum(p * math.log2(p) for p in pt if p > 0)
    h_d = -sum(p * math.log2(p) for p in pdw if p > 0)
    rows = CAT.queries["type_dow_mutual_information"](spark, SMOKE_SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_events"] == int(n)
    assert r["mi_bits"] == pytest.approx(mi, abs=1e-6)
    assert r["h_type"] == pytest.approx(h_t, rel=1e-6)
    assert r["h_dow"] == pytest.approx(h_d, rel=1e-6)


def test_hill_index_matches_numpy(spark):
    ev = _events_pdf()
    pos = ev[ev["value"] > 0]
    got = {
        r["event_type"]: r
        for r in CAT.queries["value_tail_hill_index"](spark, SMOKE_SF_DIR).collect()
    }
    for et, grp in pos.groupby("event_type"):
        ordered = grp.sort_values(
            ["value", "event_id"], ascending=[False, True]
        )
        top = ordered.head(101)["value"].to_numpy(dtype=float)
        xk1 = top.min()
        alpha = 1.0 / (np.log(top[:100]).mean() - math.log(xk1))
        r = got[et]
        assert r["n_positive"] == len(grp)
        assert r["x_k1"] == pytest.approx(xk1, rel=1e-6)
        assert r["hill_alpha"] == pytest.approx(alpha, rel=1e-5)


def test_diurnal_harmonic_matches_numpy(spark):
    ev = _events_pdf()
    pos = ev[ev["value"] > 0].copy()
    ts = pd.to_datetime(pos["ts"], utc=True)
    theta = 2.0 * math.pi * ts.dt.hour.to_numpy(dtype=float) / 24.0
    pos["c"] = pos["value"].to_numpy() * np.cos(theta)
    pos["s"] = pos["value"].to_numpy() * np.sin(theta)
    got = {
        r["user_id"]: r
        for r in CAT.queries["user_diurnal_harmonic"](spark, SMOKE_SF_DIR).collect()
    }
    for uid, grp in pos.groupby("user_id"):
        c, s, v = grp["c"].sum(), grp["s"].sum(), grp["value"].sum()
        amp = math.sqrt(c * c + s * s) / v
        peak = (math.atan2(s, c) * 24.0 / (2.0 * math.pi)) % 24.0
        r = got[uid]
        assert r["n_events"] == len(grp)
        assert r["amp_share"] == pytest.approx(amp, rel=1e-5)
        assert r["peak_hour"] == pytest.approx(peak, abs=1e-4)


def test_decontam_benchmark_slice_nonempty(spark):
    """The held-out suite and the flagged set must both be non-trivial
    on the fixture, or the decontam query degenerates to a no-op test
    (the straddle-fixture lesson)."""
    rows = CAT.queries["benchmark_decontam_13gram"](spark, SMOKE_SF_DIR).collect()
    assert sum(r["n_train_docs"] for r in rows) > 0
    assert any(r["n_flagged_any"] > 0 for r in rows), (
        "no contaminated docs in fixture; the overlap path is untested"
    )


# ---- wave 2 ---------------------------------------------------------------


def test_backlog_sweep_matches_pandas(spark):
    orders = pd.read_parquet(f"{SMOKE_SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SMOKE_SF_DIR}/lineitem.parquet")
    done = li.groupby("l_orderkey")["l_shipdate"].max()
    opened = orders["o_orderdate"].dt.floor("D").value_counts().sort_index()
    closed = (
        done.loc[done.index.intersection(orders["o_orderkey"])]
        .dt.floor("D")
        .value_counts()
        .sort_index()
    )
    days = sorted(set(opened.index) | set(closed.index))
    got = {
        pd.Timestamp(r["day"]): r
        for r in CAT.queries["orders_backlog_over_time"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert len(got) == len(days)
    backlog = 0
    for day in days:
        o = int(opened.get(day, 0))
        c = int(closed.get(day, 0))
        backlog += o - c
        r = got[pd.Timestamp(day)]
        assert (r["n_opened"], r["n_closed"], r["backlog"]) == (o, c, backlog), day
    # the final backlog must be the orders that never fully ship — with
    # every order having lineitems, exactly 0
    assert backlog == len(orders) - len(done.index.intersection(orders["o_orderkey"]))


def test_lead_time_profile_matches_pandas(spark):
    orders = pd.read_parquet(f"{SMOKE_SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SMOKE_SF_DIR}/lineitem.parquet")
    supp = pd.read_parquet(f"{SMOKE_SF_DIR}/supplier.parquet")
    nation = pd.read_parquet(f"{SMOKE_SF_DIR}/nation.parquet")
    j = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    )
    j["lead"] = (
        j["l_shipdate"].dt.floor("D") - j["o_orderdate"].dt.floor("D")
    ).dt.days
    got = {
        r["nation"]: r
        for r in CAT.queries["supplier_lead_time_profile"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    for nat, grp in j.groupby("n_name"):
        r = got[nat]
        assert r["n_lineitems"] == len(grp)
        assert r["avg_lead_days"] == pytest.approx(grp["lead"].mean(), rel=1e-6)
        assert r["max_lead_days"] == grp["lead"].max()
        assert r["n_over_30d"] == int((grp["lead"] > 30).sum())


def test_dup_cluster_histogram_exercises_multirow(spark):
    """sf0.001/sf0.01 corpora are dup-free (histogram = one size-1
    row); sf0.1 carries real exact dups, so drive the multi-cluster
    branch there against pandas."""
    docs = pd.read_parquet("/root/testdata/sf0.1/documents.parquet")
    sizes = docs.groupby("text")["doc_id"].count().value_counts().sort_index()
    assert len(sizes) > 1, "sf0.1 fixture lost its exact dups"
    got = {
        r["cluster_size"]: r
        for r in CAT.queries["exact_dup_cluster_histogram"](
            spark, "/root/testdata/sf0.1"
        ).collect()
    }
    assert set(got) == set(sizes.index)
    for size, n_clusters in sizes.items():
        assert got[size]["n_clusters"] == n_clusters
        assert got[size]["n_docs"] == size * n_clusters


def test_context_fit_matches_python(spark):
    import re

    docs = _docs_pdf()
    docs["n_tokens"] = docs["text"].map(
        lambda t: len(re.findall(r"[A-Za-z0-9]+", t))
    )
    got = {
        r["source"]: r
        for r in CAT.queries["context_window_fit_profile"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    for src, grp in docs.groupby("source"):
        r = got[src]
        assert r["n_docs"] == len(grp)
        assert r["avg_tokens"] == pytest.approx(grp["n_tokens"].mean(), rel=1e-6)
        for b in (512, 1024, 2048, 4096):
            assert r[f"n_fit_{b}"] == int((grp["n_tokens"] <= b).sum())


def test_incremental_dedup_matches_pure_python(spark):
    docs = pd.read_parquet("/root/testdata/sf0.1/documents.parquet")
    base_texts = set(docs.loc[docs["doc_id"] % 10 < 8, "text"])
    delta = docs[docs["doc_id"] % 10 >= 8].sort_values("doc_id")
    counts = defaultdict(lambda: [0, 0, 0, 0])
    seen: set = set()
    for _, row in delta.iterrows():
        st = counts[row["source"]]
        st[0] += 1
        if row["text"] in base_texts:
            st[1] += 1
        elif row["text"] in seen:
            st[2] += 1
        else:
            st[3] += 1
        seen.add(row["text"])
    got = {
        r["source"]: r
        for r in CAT.queries["incremental_dedup_delta_audit"](
            spark, "/root/testdata/sf0.1"
        ).collect()
    }
    assert set(got) == set(counts)
    total_dupbase = 0
    for src, (n, nb, nw, nu) in counts.items():
        r = got[src]
        assert (
            r["n_delta_docs"], r["n_dup_vs_base"],
            r["n_dup_within_delta"], r["n_new_unique"],
        ) == (n, nb, nw, nu), src
        total_dupbase += nb
    # at sf0.1 the split must actually exercise the dup-vs-base branch
    assert total_dupbase > 0


# ---- wave 3 ---------------------------------------------------------------


def _copurchase_edges(sf_dir: str) -> set:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    pair_count: Counter = Counter()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"]))
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pair_count[(parts[i], parts[j])] += 1
    return {p for p, c in pair_count.items() if c >= 2}


def test_assortativity_matches_numpy(spark):
    edges = _copurchase_edges(SMOKE_SF_DIR)
    deg: Counter = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    dx, dy = [], []
    for a, b in edges:  # symmetrize
        dx += [deg[a], deg[b]]
        dy += [deg[b], deg[a]]
    dx, dy = np.array(dx, dtype=float), np.array(dy, dtype=float)
    r = np.corrcoef(dx, dy)[0, 1]
    rows = CAT.queries["copurchase_degree_assortativity"](
        spark, SMOKE_SF_DIR
    ).collect()
    assert len(rows) == 1
    assert rows[0]["n_directed_edges"] == 2 * len(edges)
    assert rows[0]["n_nodes"] == len(deg)
    assert rows[0]["assortativity"] == pytest.approx(r, abs=1e-6)


def test_kcore_matches_pure_python_peeling(spark):
    # sf0.01's graph actually peels (sf0.001 is already a 3-core)
    sf_dir = "/root/testdata/sf0.01"
    edges0 = _copurchase_edges(sf_dir)

    def peel(k: int) -> tuple:
        edges = set(edges0)
        while True:
            deg: Counter = Counter()
            for a, b in edges:
                deg[a] += 1
                deg[b] += 1
            keep = {n for n, d in deg.items() if d >= k}
            pruned = {(a, b) for a, b in edges if a in keep and b in keep}
            if pruned == edges:
                break
            edges = pruned
        nodes = {n for e in edges for n in e}
        return len(nodes), len(edges)

    nodes0 = {n for e in edges0 for n in e}
    from orca_ztbus_python_processor_spark.workloads.relational import (
        copurchase_kcore_summary,
    )

    # both paths of the ≤1M-edge duality: the driver fast path (the
    # catalog default at this scale) AND the distributed fixpoint loop
    # (forced via local_edges_limit=0)
    for kwargs in ({}, {"local_edges_limit": 0}):
        got = {
            r["k"]: r
            for r in copurchase_kcore_summary(spark, sf_dir, **kwargs).collect()
        }
        peeled_any = False
        for k in (2, 3):
            cn, ce = peel(k)
            r = got[k]
            assert (r["n_nodes_total"], r["n_edges_total"]) == (
                len(nodes0), len(edges0),
            )
            assert (r["core_nodes"], r["core_edges"]) == (cn, ce), (k, kwargs)
            peeled_any = peeled_any or cn < len(nodes0)
        assert peeled_any, "fixture graph never peels; k-core loop untested"


def test_decile_migration_matches_pandas(spark):
    orders = pd.read_parquet(f"{SMOKE_SF_DIR}/orders.parquet")
    lo, hi = orders["o_orderdate"].min(), orders["o_orderdate"].max()
    mid = lo + (hi - lo) / 2
    cells: Counter = Counter()
    h = {}
    for flag, sub in (
        (1, orders[orders["o_orderdate"] <= mid]),
        (2, orders[orders["o_orderdate"] > mid]),
    ):
        rev = sub.groupby("o_custkey")["o_totalprice"].sum().reset_index()
        rev = rev.sort_values(
            ["o_totalprice", "o_custkey"], ascending=[False, True]
        ).reset_index(drop=True)
        n, k = len(rev), 10
        q, rem = divmod(n, k)
        deciles = {}
        for i, cust in enumerate(rev["o_custkey"]):
            if q == 0:
                deciles[cust] = i + 1
            elif i < rem * (q + 1):
                deciles[cust] = i // (q + 1) + 1
            else:
                deciles[cust] = rem + (i - rem * (q + 1)) // q + 1
        h[flag] = deciles
    for cust in set(h[1]) | set(h[2]):
        cells[(h[1].get(cust, 0), h[2].get(cust, 0))] += 1
    got = {
        (r["decile_h1"], r["decile_h2"]): r["n_customers"]
        for r in CAT.queries["customer_decile_migration"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert got == dict(cells)


def test_dedup_bias_matches_pandas(spark):
    # round-10 rework: the audited policy is template-prefix dedup
    # (keeper per normalized first-13-token prefix) — the grain with
    # live drops at every fixture scale
    import re

    docs = pd.read_parquet("/root/testdata/sf0.1/documents.parquet")
    docs["pre"] = docs["text"].map(
        lambda t: " ".join(re.findall(r"[a-z0-9]+", t.lower())[:13])
    )
    keep = docs.groupby("pre")["doc_id"].min()
    docs["kept"] = docs["doc_id"] == docs["pre"].map(keep)
    assert (~docs["kept"]).sum() > 0, "sf0.1 fixture lost its prefix dups"
    got = {
        r["source"]: r
        for r in CAT.queries["dedup_quality_bias_audit"](
            spark, "/root/testdata/sf0.1"
        ).collect()
    }
    for src, grp in docs.groupby("source"):
        r = got[src]
        assert r["n_kept"] == int(grp["kept"].sum())
        assert r["n_dropped"] == int((~grp["kept"]).sum())
        kept_mean = grp.loc[grp["kept"], "n_chars"].mean()
        assert r["kept_mean_chars"] == pytest.approx(kept_mean, rel=1e-6)
        dropped = grp.loc[~grp["kept"], "n_chars"]
        if len(dropped):
            assert r["dropped_mean_chars"] == pytest.approx(
                dropped.mean(), rel=1e-6
            )
        else:
            assert r["dropped_mean_chars"] is None


def test_fano_matches_pandas(spark):
    ev = _events_pdf()
    ev["m"] = pd.to_datetime(ev["ts"]).dt.floor("min")
    got = {
        r["user_id"]: r
        for r in CAT.queries["user_burstiness_fano"](spark, SMOKE_SF_DIR).collect()
    }
    for uid, grp in ev.groupby("user_id"):
        c = grp.groupby("m")["event_id"].count().to_numpy(dtype=float)
        r = got[uid]
        assert r["n_events"] == len(grp)
        assert r["n_active_minutes"] == len(c)
        fano = ((c * c).mean() - c.mean() ** 2) / c.mean()
        assert r["fano_factor"] == pytest.approx(fano, abs=1e-6)


# ---- wave 4 ---------------------------------------------------------------


def test_vocab_coverage_matches_counter(spark):
    import re

    docs = _docs_pdf()
    c: Counter = Counter()
    for text in docs["text"]:
        c.update(re.findall(r"[a-z0-9]+", text.lower()))
    total = sum(c.values())
    ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    top100 = sum(v for _, v in ordered[:100])
    top1000 = sum(v for _, v in ordered[:1000])
    rows = CAT.queries["vocab_pareto_coverage"](spark, SMOKE_SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_total_tokens"] == total
    assert r["vocab_size"] == len(c)
    assert r["top100_share"] == pytest.approx(top100 / total, rel=1e-6)
    assert r["top1000_share"] == pytest.approx(top1000 / total, rel=1e-6)


def test_fanout_histogram_matches_pandas(spark):
    li = pd.read_parquet(f"{SMOKE_SF_DIR}/lineitem.parquet")
    fan = li.groupby("l_orderkey")["l_partkey"].count()
    hist = fan.value_counts().sort_index()
    got = {
        r["fanout"]: r
        for r in CAT.queries["order_fanout_histogram"](spark, SMOKE_SF_DIR).collect()
    }
    assert set(got) == set(hist.index)
    for fanout, n_orders in hist.items():
        assert got[fanout]["n_orders"] == n_orders
        assert got[fanout]["n_lineitems"] == fanout * n_orders


def test_stream_latency_bands_match_pandas_quantiles(spark):
    """The streaming percentile bands must equal pandas' interpolating
    quantile on every CLOSED window (the append contract: windows whose
    end precedes max(ts) - 10 min)."""
    ev = _events_pdf()
    ts = pd.to_datetime(ev["ts"])
    ev = ev.assign(m=ts.dt.floor("min"))
    horizon = ts.max() - pd.Timedelta(minutes=10)
    closed = ev[ev["m"] + pd.Timedelta(minutes=1) <= horizon]
    got = {
        pd.Timestamp(r["time_from"]): r
        for r in CAT.queries["stream_minute_latency_bands"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    grps = dict(list(closed.groupby("m")))
    assert set(got) == {pd.Timestamp(m) for m in grps}
    for m, grp in list(grps.items())[:50]:
        r = got[pd.Timestamp(m)]
        assert r["n_events"] == len(grp)
        assert r["p50"] == pytest.approx(grp["value"].quantile(0.5), rel=1e-6)
        assert r["p95"] == pytest.approx(grp["value"].quantile(0.95), rel=1e-6)
        assert r["p99"] == pytest.approx(grp["value"].quantile(0.99), rel=1e-6)


def test_stream_hll_minute_within_envelope_of_exact(spark):
    """Rows-only streaming sketch entry: each closed window's HLL
    estimate must sit inside the envelope of the exact per-window
    distinct count (rsd = 0.02 -> 10% at 5 sigma, small-cardinality
    floor), and the window set must be exactly the closed windows."""
    ev = _events_pdf()
    ts = pd.to_datetime(ev["ts"])
    ev = ev.assign(m=ts.dt.floor("min"))
    horizon = ts.max() - pd.Timedelta(minutes=10)
    closed = ev[ev["m"] + pd.Timedelta(minutes=1) <= horizon]
    exact = closed.groupby("m")["user_id"].nunique()
    got = {
        pd.Timestamp(r["time_from"]): r
        for r in CAT.queries["stream_distinct_users_hll_minute"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert set(got) == {pd.Timestamp(m) for m in exact.index}
    for m, users in exact.items():
        est = got[pd.Timestamp(m)]["approx_users"]
        assert abs(est - users) <= max(3, 0.10 * users), (m, est, users)


def test_semantic_decontam_matches_numpy(spark):
    """Wave-5: max-cos-vs-benchmark per train vector, rolled up by
    source — from-scratch numpy reference (f32 per-pair boundary, max
    second, zero-norm exclusion), independent of both engines."""
    emb = pd.read_parquet(f"{SMOKE_SF_DIR}/embeddings.parquet")
    docs = _docs_pdf()
    X = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy(dtype=np.int64)
    nrm = np.linalg.norm(X, axis=1)
    keep = nrm > 0.0
    X, ids, nrm = X[keep], ids[keep], nrm[keep]
    is_bench = ids % 97 == 0
    B, T = X[is_bench] / nrm[is_bench, None], X[~is_bench] / nrm[~is_bench, None]
    t_ids = ids[~is_bench]
    assert is_bench.sum() > 0, "fixture must populate the benchmark slice"
    max_cos = (T @ B.T).astype(np.float32).max(axis=1)
    src = docs.set_index("doc_id")["source"]
    ref = (
        pd.DataFrame({"vec_id": t_ids, "max_cos": max_cos})
        .assign(source=lambda d: d["vec_id"].map(src))
        .groupby("source")
        .agg(
            n_train_vecs=("max_cos", "size"),
            n_flagged=("max_cos", lambda s: int((s >= 0.35).sum())),
            n_flagged_strong=("max_cos", lambda s: int((s >= 0.5).sum())),
            mean_max_cos=("max_cos", "mean"),
            peak_cos=("max_cos", "max"),
        )
    )
    got = {
        r["source"]: r
        for r in CAT.queries["semantic_decontam_embedding"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert set(got) == set(ref.index)
    for source, row in ref.iterrows():
        g = got[source]
        assert g["n_train_vecs"] == row["n_train_vecs"]
        assert g["n_flagged"] == row["n_flagged"]
        assert g["n_flagged_strong"] == row["n_flagged_strong"]
        assert g["mean_max_cos"] == pytest.approx(row["mean_max_cos"], rel=1e-6)
        assert g["peak_cos"] == pytest.approx(row["peak_cos"], rel=1e-6)


def test_centroid_drift_matches_numpy(spark):
    """Wave-5: per-batch centroid cosine to the global centroid plus
    mean L2 norm — numpy reference over contiguous vec_id range
    batches."""
    emb = pd.read_parquet(f"{SMOKE_SF_DIR}/embeddings.parquet")
    X = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy(dtype=np.int64)
    batch = np.floor(16 * ids / (ids.max() + 1.0)).astype(np.int64)
    gc = X.mean(axis=0)
    got = {
        r["batch"]: r
        for r in CAT.queries["embedding_batch_centroid_drift"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    assert set(got) == set(np.unique(batch).tolist())
    assert len(got) > 1, "fixture must span multiple batches"
    for b in np.unique(batch):
        sel = X[batch == b]
        bc = sel.mean(axis=0)
        cos = bc @ gc / (np.linalg.norm(bc) * np.linalg.norm(gc))
        g = got[int(b)]
        assert g["n_vecs"] == int((batch == b).sum())
        assert g["cos_to_global"] == pytest.approx(cos, rel=1e-6)
        assert g["mean_l2_norm"] == pytest.approx(
            np.linalg.norm(sel, axis=1).mean(), rel=1e-6
        )


def test_chunk_dedup_matches_python(spark):
    """Wave-6: stride-16 token-chunk dedup census — from-scratch python
    chunker + Counter, independent of both engines' md5/array paths."""
    import re

    docs = _docs_pdf()
    chunks = []  # (source, chunk_text, n_tok)
    for _, row in docs.iterrows():
        toks = re.findall(r"[a-z0-9]+", row["text"].lower())
        for i in range(0, len(toks), 16):
            part = toks[i : i + 16]
            chunks.append((row["source"], " ".join(part), len(part)))
    freq = Counter(c for _, c, _ in chunks)
    ref = defaultdict(lambda: [0, 0, 0, 0])  # n, n_dup, tok, dup_tok
    for src, c, nt in chunks:
        r = ref[src]
        r[0] += 1
        r[2] += nt
        if freq[c] >= 2:
            r[1] += 1
            r[3] += nt
    got = {
        r["source"]: r
        for r in CAT.queries["chunk_dedup_profile"](spark, SMOKE_SF_DIR).collect()
    }
    assert set(got) == set(ref)
    assert sum(r[1] for r in ref.values()) > 0, "fixture must contain dup chunks"
    for src, (n, nd, nt, ndt) in ref.items():
        g = got[src]
        assert (g["n_chunks"], g["n_dup_chunks"], g["n_tokens"]) == (n, nd, nt)
        assert g["dup_token_share"] == pytest.approx(ndt / nt, rel=1e-6)


def test_split_leakage_planted_cross_split_dups(spark, tmp_path):
    """Wave-6: the sf0.001/sf0.01 fixtures contain no exact dups, so the
    leakage branch is pinned on a PLANTED corpus: duplicate texts placed
    on doc_ids whose md5-split assignment is computed from scratch here,
    guaranteeing cross-split clusters exist."""
    import hashlib

    def split_of(doc_id: int) -> str:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
        return "train" if h < "d" else ("val" if h < "f" else "test")

    ids = list(range(1, 401))
    by_split = defaultdict(list)
    for i in ids:
        by_split[split_of(i)].append(i)
    assert all(len(v) >= 3 for v in by_split.values())
    # text plan: 3 cross-split dup clusters + unique rest
    texts = {}
    t_ids, v_ids, s_ids = (by_split[s] for s in ("train", "val", "test"))
    for a, b in [(t_ids[0], v_ids[0]), (t_ids[1], s_ids[0]),
                 (v_ids[1], s_ids[1])]:
        texts[a] = texts[b] = f"dup cluster {min(a, b)}"
    # one same-split dup cluster (multi but NOT cross)
    texts[t_ids[2]] = texts[t_ids[3]] = "train only dup"
    for i in ids:
        texts.setdefault(i, f"unique text {i}")
    pdf = pd.DataFrame(
        {
            "doc_id": ids,
            "text": [texts[i] for i in ids],
            "lang": "en",
            "source": "srcX",
            "n_chars": [len(texts[i]) for i in ids],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = {
        r["split"]: r
        for r in CAT.queries["split_leakage_audit"](
            spark, str(tmp_path)
        ).collect()
    }
    # expected from scratch
    h2splits = defaultdict(set)
    for i in ids:
        h2splits[texts[i]].add(split_of(i))
    exp = {
        s: dict(n_docs=0, n_cross_split=0, n_leaked_from_train=0)
        for s in ("train", "val", "test")
    }
    for i in ids:
        s = split_of(i)
        exp[s]["n_docs"] += 1
        if len(h2splits[texts[i]]) >= 2:
            exp[s]["n_cross_split"] += 1
        if s != "train" and "train" in h2splits[texts[i]]:
            exp[s]["n_leaked_from_train"] += 1
    assert sum(e["n_cross_split"] for e in exp.values()) >= 6
    assert sum(e["n_leaked_from_train"] for e in exp.values()) >= 2
    for s, e in exp.items():
        g = got[s]
        assert (g["n_docs"], g["n_cross_split"], g["n_leaked_from_train"]) == (
            e["n_docs"],
            e["n_cross_split"],
            e["n_leaked_from_train"],
        ), s


def test_effective_rank_matches_numpy(spark):
    """Wave-6: participation ratio trace(C)^2/||C||_F^2 of the centered
    covariance per label and pooled — numpy eigenvalue cross-check
    included (PR must equal (sum l)^2 / sum l^2 of the spectrum)."""
    emb = pd.read_parquet(f"{SMOKE_SF_DIR}/embeddings.parquet")
    X = np.array(emb["embedding"].tolist(), dtype=np.float64)
    labels = emb["label"].to_numpy()
    got = {
        r["label"]: r
        for r in CAT.queries["embedding_effective_rank"](
            spark, SMOKE_SF_DIR
        ).collect()
    }
    groups = {int(v): X[labels == v] for v in np.unique(labels)}
    groups[-1] = X
    assert set(got) == set(groups)
    for lab, M in groups.items():
        C = np.cov(M, rowvar=False, bias=True)
        tr = np.trace(C)
        pr = tr**2 / (C * C).sum()
        ev = np.linalg.eigvalsh(C)
        assert pr == pytest.approx(ev.sum() ** 2 / (ev**2).sum(), rel=1e-9)
        g = got[lab]
        assert g["n_vectors"] == len(M)
        assert g["trace"] == pytest.approx(tr, rel=1e-6)
        assert g["participation_ratio"] == pytest.approx(pr, rel=1e-6)
        assert 1.0 <= g["participation_ratio"] <= M.shape[1]


def test_label_propagation_matches_pure_python(spark):
    """Wave-6: synchronous weighted LPA (4 rounds, max-weight/min-label
    tie-break) — from-scratch python propagation over the same
    co-purchase edge build."""
    li = pd.read_parquet(f"{SMOKE_SF_DIR}/lineitem.parquet")
    w = Counter()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"]))
        for ai in range(len(parts)):
            for bi in range(ai + 1, len(parts)):
                w[(parts[ai], parts[bi])] += 1
    nbrs = defaultdict(dict)
    for (a, b), c in w.items():
        nbrs[a][b] = nbrs[a].get(b, 0) + c
        nbrs[b][a] = nbrs[b].get(a, 0) + c
    label = {n: n for n in nbrs}
    for _ in range(4):
        votes = {}
        for n, nb in nbrs.items():
            acc = defaultdict(float)
            for m, wt in nb.items():
                acc[label[m]] += wt
            votes[n] = min(
                acc, key=lambda lb: (-acc[lb], lb)
            )  # max weight, then min label
        label = votes
    sizes = Counter(label.values())
    ranked = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = CAT.queries["copurchase_label_propagation"](
        spark, SMOKE_SF_DIR
    ).collect()
    assert len(got) == len(ranked)
    assert any(s >= 2 for _, s in ranked), "fixture must form a community"
    for row, (community, size) in zip(sorted(got, key=lambda r: r["rank"]), ranked):
        assert (row["community"], row["size"]) == (community, size)


def test_hill_index_small_group_emits_null_alpha(spark, tmp_path):
    """Round-8 review fix: a group with fewer than HILL_K+1 positive
    values cannot supply the k order statistics the estimator is
    defined over — it must keep its census columns but emit NULL
    hill_alpha, never a partial-sum-over-constant-k fabrication."""
    big_n = 150
    small_n = 40
    rows = []
    eid = 0
    for i in range(big_n):
        eid += 1
        rows.append((eid, "2024-01-01T00:00:00", 1, "big", 1.0 + i, "{}"))
    for i in range(small_n):
        eid += 1
        rows.append((eid, "2024-01-01T00:00:00", 1, "small", 1.0 + i, "{}"))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(tmp_path / "events.parquet")
    got = {
        r["event_type"]: r
        for r in CAT.queries["value_tail_hill_index"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["small"]["n_positive"] == small_n
    assert got["small"]["hill_alpha"] is None
    assert got["small"]["x_k1"] == pytest.approx(1.0)  # min of its own top set
    # big group: full k+1 statistics -> numpy reference value
    vals = np.sort(1.0 + np.arange(big_n))[::-1]
    xk1 = vals[100]
    ref = 1.0 / (np.log(vals[:100]).mean() - np.log(xk1))
    assert got["big"]["n_positive"] == big_n
    assert got["big"]["hill_alpha"] == pytest.approx(ref, rel=1e-6)
