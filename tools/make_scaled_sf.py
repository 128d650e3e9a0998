#!/usr/bin/env python
"""Generate a scaled-up replica of a testdata sf directory for scaling receipts.

The driver ships sf{0.001,0.01,0.1}; SCALE.md's shuffle arithmetic is
plan-pinned but needs one *measured* point beyond sf0.1.  This script
builds /tmp/sf1 (or any --factor multiple) from sf0.1 by replication with
structure-preserving perturbation, so per-key timing exponents are about
the ENGINE, not about artifacts of naive duplication:

- documents: replica i>0 gets a per-(doc,replica) deterministic word
  shuffle.  Naive copies would make every doc a near-dup of its 9 clones,
  inflating LSH pair/edge counts ~45x over natural scaling and poisoning
  the curate_corpus / simhash exponents.  A full word shuffle destroys
  shingle overlap (n-gram Jaccard ~ 2 random docs), so near-dup DENSITY
  stays scale-invariant while token/char distributions are preserved.
- embeddings: replica i applies the i-th power of a fixed random
  dimension permutation (+ id shift).  Norms and coordinate distribution
  are exactly preserved; permuted vectors are as far from their originals
  as random pairs, so kNN/IVF/PQ cell-occupancy statistics scale naturally.
- fact tables (lineitem/orders/customer/part/supplier/events): keys shift
  by replica so intra-replica joins still match; dimension tables
  (nation/region) copy as-is, as in TPC-H.

Deterministic (seed 42 + replica index); never writes under /root/testdata.

Usage: python tools/make_scaled_sf.py [--src /root/testdata/sf0.1] \
           [--dst /tmp/sf1] [--factor 10]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KEY_SHIFT = 10_000_000  # > any base key; replica i adds i*KEY_SHIFT


def _shuffle_words(text: str, rng: np.random.Generator) -> str:
    words = text.split()
    if len(words) < 2:
        return text
    return " ".join(np.array(words, dtype=object)[rng.permutation(len(words))])


def scale_documents(src: str, dst: str, factor: int) -> None:
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    doc_id = t.column("doc_id").to_numpy()
    text = t.column("text").to_pylist()
    lang, source = t.column("lang"), t.column("source")
    parts = [t]
    for i in range(1, factor):
        rng = np.random.default_rng(42 + i)
        new_text = [_shuffle_words(s, rng) for s in text]
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(doc_id + i * KEY_SHIFT),
                    "text": pa.array(new_text),
                    "lang": lang,
                    "source": source,
                    "n_chars": pa.array([len(s) for s in new_text], pa.int64()),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), os.path.join(dst, "documents.parquet"))


def scale_embeddings(src: str, dst: str, factor: int) -> None:
    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    vec_id = t.column("vec_id").to_numpy()
    V = np.stack(t.column("embedding").to_pylist()).astype(np.float32)
    label = t.column("label")
    d = V.shape[1]
    base_perm = np.random.default_rng(42).permutation(d)
    parts = [t]
    perm = np.arange(d)
    for i in range(1, factor):
        perm = perm[base_perm]  # i-th power of the fixed permutation
        Vi = V[:, perm]
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(vec_id + i * KEY_SHIFT),
                    "embedding": pa.array(list(Vi), pa.list_(pa.float32())),
                    "label": label,
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), os.path.join(dst, "embeddings.parquet"))


# fact table -> columns to shift by replica (keeps intra-replica joins valid)
FACT_SHIFTS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
}


def scale_fact(name: str, src: str, dst: str, factor: int) -> None:
    t = pq.read_table(os.path.join(src, f"{name}.parquet"))
    shifted_cols = FACT_SHIFTS[name]
    parts = [t]
    for i in range(1, factor):
        cols = {}
        for field in t.schema.names:
            col = t.column(field)
            if field in shifted_cols:
                col = pa.array(col.to_numpy() + i * KEY_SHIFT, col.type)
            cols[field] = col
        parts.append(pa.table(cols))
    pq.write_table(pa.concat_tables(parts), os.path.join(dst, f"{name}.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--factor", type=int, default=10)
    a = ap.parse_args()
    assert not os.path.realpath(a.dst).startswith("/root/testdata"), "never write testdata"
    os.makedirs(a.dst, exist_ok=True)
    scale_documents(a.src, a.dst, a.factor)
    scale_embeddings(a.src, a.dst, a.factor)
    for name in FACT_SHIFTS:
        scale_fact(name, a.src, a.dst, a.factor)
    for name in ("nation", "region"):  # dimension tables: copy as-is
        pq.write_table(
            pq.read_table(os.path.join(a.src, f"{name}.parquet")),
            os.path.join(a.dst, f"{name}.parquet"),
        )
    for f in sorted(os.listdir(a.dst)):
        p = os.path.join(a.dst, f)
        print(f, pq.read_metadata(p).num_rows, f"{os.path.getsize(p)/1e6:.1f}MB")


if __name__ == "__main__":
    main()
