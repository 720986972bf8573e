#!/usr/bin/env python3
"""Deterministic scale-up generator for the sf1.0 stress replay (r13 verdict
"Next" #1: measure the 100x claim instead of arguing it).

The driver generates sf{0.001,0.01,0.1}; the whole-suite stress replay needs
an sf1.0 (10x bench) dataset. /root/testdata is read-only, so this tool
derives one from the driver's sf0.1 tables, replica-by-replica, preserving
the properties the engine's contracts and fixture-planted structure depend
on:

  - keys are offset per replica (key' = key + r*(max_key+1)) so every id
    space stays consecutive from 0 and referential integrity holds
    (orders->customer, lineitem->orders/part/supplier);
  - dims (region, nation) stay fixed -- they are bounded in TPC-H scaling;
  - names (c_name/s_name/p_name) get a '~r' suffix so per-entity group
    cardinality scales with rows (10x groups), not silently collapsing ten
    replicas into one name;
  - document TEXT is rotated per replica (letter/digit Caesar rotation,
    length-preserving): within a replica the corpus is EXACTLY the base
    corpus (planted dup/near-dup structure intact, word-length histograms
    identical, the unigram MaxWordLen contract safe), while cross-replica
    token overlap collapses to ~zero -- so near-dup pair counts, inverted-
    index buckets, and minhash bands scale LINEARLY in replicas instead of
    quadratically (naive text replication gives every doc 9 identical twins
    and the hot-bucket refusals fire, by design);
  - embeddings get a per-replica DIMENSION PERMUTATION (stride coprime to
    64): norms and all within-replica distances are preserved exactly,
    cross-replica cosines decorrelate -- the vector twin of the text
    rotation, for the same pair-explosion reason;
  - events are re-sorted globally by (ts, event_id) after replication: the
    replay source feeds file order, and the streaming operators' contracts
    (watermarks, per-user monotone days) assume ts-monotone arrival; a
    block-concatenated file would make batches 2..10 arrive "late" and be
    watermark-dropped, silently shrinking the measured work;
  - documents stay doc_id-monotone (the stream-ingest oracle's slicing
    identity).

Usage: python3 tools/gen_scale.py [src_dir] [dst_dir] [replicas]
       defaults: /root/testdata/sf0.1 /tmp/testdata/sf1.0 10
"""
import os
import string
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata/sf1.0"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def rot(s, r, alpha):
    n = len(alpha)
    return "".join(alpha[(alpha.index(c) + r) % n] for c in s)


def copy(table, sql):
    out = f"{DST}/{table}.parquet"
    con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"{table}: {n} rows")


def src(table):
    return f"read_parquet('{SRC}/{table}.parquet')"


# bounded dims: verbatim
for t in ("region", "nation"):
    copy(t, f"SELECT * FROM {src(t)}")

# key spaces (max+1) of the base tables
K = {}
for t, k in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
             ("part", "p_partkey"), ("orders", "o_orderkey"),
             ("events", "event_id"), ("documents", "doc_id"),
             ("embeddings", "vec_id")]:
    K[t] = con.execute(f"SELECT MAX({k}) + 1 FROM {src(t)}").fetchone()[0]
K["user"] = con.execute(
    f"SELECT MAX(user_id) + 1 FROM {src('events')}").fetchone()[0]


def replicate(table, select_fn, order_by=None):
    arms = " UNION ALL ".join(
        f"SELECT {select_fn(r)} FROM {src(table)}" for r in range(R))
    copy(table, arms + (f" ORDER BY {order_by}" if order_by else ""))


replicate("customer", lambda r: f"""
    c_custkey + {r * K['customer']} AS c_custkey,
    c_name || '{'' if r == 0 else f'~{r}'}' AS c_name,
    c_nationkey, c_acctbal, c_mktsegment""")

replicate("supplier", lambda r: f"""
    s_suppkey + {r * K['supplier']} AS s_suppkey,
    s_name || '{'' if r == 0 else f'~{r}'}' AS s_name,
    s_nationkey, s_acctbal""")

replicate("part", lambda r: f"""
    p_partkey + {r * K['part']} AS p_partkey,
    p_name || '{'' if r == 0 else f'~{r}'}' AS p_name,
    p_brand, p_type, p_size, p_retailprice""")

replicate("orders", lambda r: f"""
    o_orderkey + {r * K['orders']} AS o_orderkey,
    o_custkey + {r * K['customer']} AS o_custkey,
    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority""")

replicate("lineitem", lambda r: f"""
    l_orderkey + {r * K['orders']} AS l_orderkey,
    l_partkey + {r * K['part']} AS l_partkey,
    l_suppkey + {r * K['supplier']} AS l_suppkey,
    l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
    l_returnflag, l_linestatus, l_shipdate""")

# events: replicate, then GLOBAL ts re-sort (see module doc)
replicate("events", lambda r: f"""
    event_id + {r * K['events']} AS event_id, ts,
    user_id + {r * K['user']} AS user_id, event_type, value, props""",
    order_by="ts, event_id")

# documents: per-replica Caesar rotation of letters and digits
lower, upper, digit = string.ascii_lowercase, string.ascii_uppercase, string.digits


def doc_select(r):
    if r == 0:
        return f"doc_id, text, lang, source, n_chars"
    frm = lower + upper + digit
    to = rot(lower, r, lower) + rot(upper, r, upper) + rot(digit, r, digit)
    return (f"doc_id + {r * K['documents']} AS doc_id, "
            f"translate(text, '{frm}', '{to}') AS text, lang, source, n_chars")


replicate("documents", doc_select, order_by="doc_id")

# embeddings: per-replica dimension permutation, stride coprime to 64
DIM = con.execute(
    f"SELECT len(embedding) FROM {src('embeddings')} LIMIT 1").fetchone()[0]
STRIDES = [1, 3, 5, 7, 9, 11, 13, 15, 17, 19, 21, 23, 25, 27, 29, 31]


def emb_select(r):
    p = STRIDES[r % len(STRIDES)]
    # the permutation is bijective ONLY when gcd(stride, DIM) == 1; DIM is
    # read from the data, so assert instead of assuming 64 — a shared factor
    # would silently duplicate coordinates and break the norm-preservation
    # invariant this transform exists for
    import math
    assert math.gcd(p, DIM) == 1, f"stride {p} not coprime to DIM {DIM}"
    if p == 1:
        perm = "embedding"
    else:
        perm = (f"list_transform(range(0, {DIM}), "
                f"i -> embedding[((i * {p}) % {DIM}) + 1])")
    return (f"vec_id + {r * K['embeddings']} AS vec_id, "
            f"CAST({perm} AS FLOAT[]) AS embedding, label")


replicate("embeddings", emb_select, order_by="vec_id")

print(f"done -> {DST} (replicas={R})")
