#!/usr/bin/env python
"""Deterministically scale the driver's testdata by an integer factor.

Produces an sf1-shaped dataset from sf0.1 by replicating each table K
times with consistent key remapping, so referential integrity and join
selectivity are preserved (customer r_i only joins orders r_i, etc.).
Used for the fixed-cost-amortization study in BASELINE.md — the driver
only ships sf<=0.1, but the vs-DuckDB ratio at sf0.1 is dominated by
Spark's ~0.65s/query planning overhead; this dataset lets both engines
run the same queries at 10x the data on the same machine.

Design notes (why not naive replication):
- Entity names (c_name/s_name/p_name) get a replica suffix so
  name-equality joins (fuzzy_name_pairs) keep per-replica structure
  instead of fanning out K^2.
- Document text is perturbed every 7th token for replicas i>0, which
  breaks cross-replica shingle overlap (jaccard well below dedup
  thresholds) while leaving within-replica near-dup structure intact —
  dedup workloads scale with the data instead of degenerating into one
  giant K-clique per document.
- Embeddings get small deterministic gaussian noise per replica so ANN
  workloads see 10x distinct points, not 10 exact copies of each.

Usage:
    python scripts/make_scaled_sf.py [--src /root/testdata/sf0.1] \
        [--dst /root/repo/.data/sf1] [--k 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _read(src: str, name: str) -> pa.Table:
    return pq.read_table(os.path.join(src, f"{name}.parquet"))


def _write(dst: str, name: str, tbl: pa.Table) -> None:
    pq.write_table(tbl, os.path.join(dst, f"{name}.parquet"))


def _offset(col: pa.ChunkedArray) -> int:
    # max+1 keeps ids dense-ish; replica i adds i*offset
    return int(pa.compute.max(col).as_py()) + 1


def _shift(tbl: pa.Table, col: str, off: int, i: int) -> pa.Table:
    idx = tbl.schema.get_field_index(col)
    shifted = pa.compute.add(tbl.column(col), i * off)
    return tbl.set_column(idx, tbl.schema.field(idx), shifted.cast(tbl.schema.field(idx).type))


def _suffix(tbl: pa.Table, col: str, i: int) -> pa.Table:
    if i == 0:
        return tbl
    idx = tbl.schema.get_field_index(col)
    tagged = pa.compute.binary_join_element_wise(
        tbl.column(col).cast(pa.string()), f" r{i}", ""
    )
    return tbl.set_column(idx, tbl.schema.field(idx), tagged)


def _perturb_text(texts: list[str], i: int) -> list[str]:
    if i == 0:
        return texts
    out = []
    for t in texts:
        words = t.split(" ")
        out.append(
            " ".join(
                w + f"r{i}" if j % 7 == 0 else w for j, w in enumerate(words)
            )
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/.data/sf1")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    # fixed dims: copy once, keys unchanged so FK joins still land
    for name in ("region", "nation"):
        _write(args.dst, name, _read(args.src, name))

    customer = _read(args.src, "customer")
    supplier = _read(args.src, "supplier")
    part = _read(args.src, "part")
    orders = _read(args.src, "orders")
    lineitem = _read(args.src, "lineitem")
    events = _read(args.src, "events")
    documents = _read(args.src, "documents")
    embeddings = _read(args.src, "embeddings")

    ck = _offset(customer.column("c_custkey"))
    sk = _offset(supplier.column("s_suppkey"))
    pk = _offset(part.column("p_partkey"))
    ok = _offset(orders.column("o_orderkey"))
    ek = _offset(events.column("event_id"))
    uk = _offset(events.column("user_id"))
    dk = _offset(documents.column("doc_id"))
    vk = _offset(embeddings.column("vec_id"))

    def replicas(build):
        return pa.concat_tables([build(i) for i in range(args.k)])

    _write(
        args.dst,
        "customer",
        replicas(lambda i: _suffix(_shift(customer, "c_custkey", ck, i), "c_name", i)),
    )
    _write(
        args.dst,
        "supplier",
        replicas(lambda i: _suffix(_shift(supplier, "s_suppkey", sk, i), "s_name", i)),
    )
    _write(
        args.dst,
        "part",
        replicas(lambda i: _suffix(_shift(part, "p_partkey", pk, i), "p_name", i)),
    )
    _write(
        args.dst,
        "orders",
        replicas(
            lambda i: _shift(_shift(orders, "o_orderkey", ok, i), "o_custkey", ck, i)
        ),
    )
    _write(
        args.dst,
        "lineitem",
        replicas(
            lambda i: _shift(
                _shift(_shift(lineitem, "l_orderkey", ok, i), "l_partkey", pk, i),
                "l_suppkey",
                sk,
                i,
            )
        ),
    )
    _write(
        args.dst,
        "events",
        replicas(
            lambda i: _shift(_shift(events, "event_id", ek, i), "user_id", uk, i)
        ),
    )

    texts = documents.column("text").to_pylist()

    def build_docs(i: int) -> pa.Table:
        t = _shift(documents, "doc_id", dk, i)
        idx = t.schema.get_field_index("text")
        return t.set_column(
            idx, t.schema.field(idx), pa.array(_perturb_text(texts, i), pa.string())
        )

    _write(args.dst, "documents", replicas(build_docs))

    vecs = np.array(embeddings.column("embedding").to_pylist(), dtype=np.float32)

    def build_embs(i: int) -> pa.Table:
        t = _shift(embeddings, "vec_id", vk, i)
        if i == 0:
            return t
        rng = np.random.default_rng(42 + i)
        noisy = vecs + rng.normal(0.0, 0.05, vecs.shape).astype(np.float32)
        idx = t.schema.get_field_index("embedding")
        return t.set_column(
            idx,
            t.schema.field(idx),
            pa.array(list(noisy), pa.list_(pa.float32())),
        )

    _write(args.dst, "embeddings", replicas(build_embs))

    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        n = pq.read_metadata(os.path.join(args.dst, f"{name}.parquet")).num_rows
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
