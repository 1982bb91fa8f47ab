#!/usr/bin/env python
"""Build a scaled bench fixture (default sf1 = 10x sf0.1) from the
driver testdata, for scaling-slope measurements only — correctness runs
stay on the driver's own parquet.

Each replica r (0..factor-1, r=0 the original) shifts every key family
by r * (its sf0.1 keyspace size), so replicas are disjoint but
FK-consistent subgraphs: orders still join customers, lineitem still
joins orders/part/supplier, events.user_id still lands in the customer
key range. Timestamps and dates are left unchanged — scaling grows
rows-per-window / rows-per-date (horizontal growth), matching how a
bigger deployment actually looks.

Content columns are decorrelated across replicas so similarity/dedup
operators keep a realistic match density instead of a degenerate
every-doc-has-factor-copies blow-up:

* documents.text: per-replica alphabet rotation (``translate``) —
  within-replica dup/near-dup structure is preserved exactly, while
  cross-replica shingle overlap drops to ~0.
* embeddings.embedding: per-replica deterministic sign flips per
  dimension — within-replica cosine structure preserved, cross-replica
  similarity ~random.

Usage: python scripts/make_scale_fixture.py [--factor 10]
       [--src /root/testdata/sf0.1] [--out /tmp/sf1]

``--factor`` is bounded at 26: the text decorrelation is an alphabet
rotation, so replicas r and r+26 would carry byte-identical text under
different doc_ids — collapsing the advertised cross-replica
decorrelation into an exact-dup blow-up that skews dedup-path scaling.
Past 26, compose rotation with a per-replica token permutation first.
"""

from __future__ import annotations

import argparse
import os

import duckdb

# key family -> (column -> family) handled inline; offsets = keyspace size
OFFSETS = {
    "cust": 15_000,   # c_custkey, o_custkey, events.user_id
    "order": 150_000,  # o_orderkey, l_orderkey
    "part": 20_000,   # p_partkey, l_partkey
    "supp": 1_000,    # s_suppkey, l_suppkey
    "event": 100_000,  # event_id
    "doc": 5_000,     # doc_id
    "vec": 2_000,     # vec_id
}

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def rot(r: int) -> str:
    assert 0 <= r < 26, "factor > 26 repeats rotations (see module docstring)"
    return ALPHA[r:] + ALPHA[:r]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    args = ap.parse_args()
    if not 1 <= args.factor <= 26:
        ap.error("--factor must be in [1, 26]: the alphabet-rotation "
                 "decorrelation repeats past 26 (see module docstring)")
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT range AS r FROM range({args.factor})")

    def src(t: str) -> str:
        return f"'{args.src}/{t}.parquet'"

    def write(t: str, sql: str) -> None:
        # Bound row-group size: Spark parallelizes a parquet scan at
        # row-group granularity, so one jumbo row group serializes every
        # downstream stage on a single core — a strawman a real corpus
        # (thousands of splittable files) never presents. 8192 rows per
        # group keeps even the small wide-fanout tables (documents,
        # embeddings) splittable ~proportionally to local core counts.
        con.execute(
            f"COPY ({sql}) TO '{args.out}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 8192)"
        )
        n = con.execute(f"SELECT count(*) FROM '{args.out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")

    # dimension tables: fixed size, copied through
    for t in ("region", "nation"):
        write(t, f"SELECT * FROM {src(t)}")

    o = OFFSETS
    write("customer", f"""
        SELECT c_custkey + r * {o['cust']} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM {src('customer')}, reps""")
    write("supplier", f"""
        SELECT s_suppkey + r * {o['supp']} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM {src('supplier')}, reps""")
    write("part", f"""
        SELECT p_partkey + r * {o['part']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {src('part')}, reps""")
    write("orders", f"""
        SELECT o_orderkey + r * {o['order']} AS o_orderkey,
               o_custkey + r * {o['cust']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, reps""")
    write("lineitem", f"""
        SELECT l_orderkey + r * {o['order']} AS l_orderkey,
               l_partkey + r * {o['part']} AS l_partkey,
               l_suppkey + r * {o['supp']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}, reps""")
    write("events", f"""
        SELECT event_id + r * {o['event']} AS event_id,
               ts,
               user_id + r * {o['cust']} AS user_id,
               event_type, value, props
        FROM {src('events')}, reps""")

    rot_cases = " ".join(
        f"WHEN {r} THEN translate(text, '{ALPHA}', '{rot(r)}')"
        for r in range(args.factor)
    )
    write("documents", f"""
        SELECT doc_id + r * {o['doc']} AS doc_id,
               CASE r {rot_cases} END AS text,
               lang, source, n_chars
        FROM {src('documents')}, reps""")
    write("embeddings", f"""
        SELECT vec_id + r * {o['vec']} AS vec_id,
               CAST(list_transform(embedding,
                    (x, i) -> x * (CASE WHEN hash(r * 97 + i) % 2 = 0
                                        THEN 1 ELSE -1 END)) AS FLOAT[])
                   AS embedding,
               label
        FROM {src('embeddings')}, reps""")


if __name__ == "__main__":
    main()
