"""Generate a larger scale factor by join-consistent replication of an
existing testdata directory (for local scaling soaks — VERDICT r5 item 6).

Copy k of each fact table shifts every key by k * stride(table-key-domain),
so copy k's lineitem joins copy k's orders/part/supplier and copy k's
events/documents/embeddings keep their own id space. Dimension tables
(region, nation) are NOT replicated, matching TPC-H's fixed dims. Value
columns (prices, dates, text, vectors) are left untouched, so per-copy
distributions — and therefore selectivities, skew shapes, and dup rates —
match the source; the composite is a 10x-volume workload with 10x daily
event density and 10x duplicate clusters, which is the scaling direction a
real crawl/ledger grows in anyway.

Usage: python scripts/make_scale.py [src_dir] [dst_dir] [copies]
Defaults: /root/testdata/sf0.1 -> .scratch/sf1, 10 copies.
"""

from __future__ import annotations

import os
import sys

import duckdb


def stride(con, path, col):
    (mx,) = con.execute(f"SELECT MAX({col}) FROM read_parquet('{path}')").fetchone()
    s = 1
    while s <= mx:
        s *= 10
    return s


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else ".scratch/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    strides = {
        "order": stride(con, f"{src}/orders.parquet", "o_orderkey"),
        "cust": stride(con, f"{src}/customer.parquet", "c_custkey"),
        "part": stride(con, f"{src}/part.parquet", "p_partkey"),
        "supp": stride(con, f"{src}/supplier.parquet", "s_suppkey"),
        "user": stride(con, f"{src}/events.parquet", "user_id"),
        "event": stride(con, f"{src}/events.parquet", "event_id"),
        "doc": stride(con, f"{src}/documents.parquet", "doc_id"),
        "vec": stride(con, f"{src}/embeddings.parquet", "vec_id"),
    }

    shifted = {
        "customer": ("c_custkey + k * {cust} AS c_custkey, c_name,"
                     " c_nationkey, c_acctbal, c_mktsegment"),
        "supplier": ("s_suppkey + k * {supp} AS s_suppkey, s_name,"
                     " s_nationkey, s_acctbal"),
        "part": ("p_partkey + k * {part} AS p_partkey, p_name, p_brand,"
                 " p_type, p_size, p_retailprice"),
        "orders": ("o_orderkey + k * {order} AS o_orderkey,"
                   " o_custkey + k * {cust} AS o_custkey, o_orderstatus,"
                   " o_totalprice, o_orderdate, o_orderpriority"),
        "lineitem": ("l_orderkey + k * {order} AS l_orderkey,"
                     " l_partkey + k * {part} AS l_partkey,"
                     " l_suppkey + k * {supp} AS l_suppkey, l_linenumber,"
                     " l_quantity, l_extendedprice, l_discount, l_tax,"
                     " l_returnflag, l_linestatus, l_shipdate"),
        "events": ("event_id + k * {event} AS event_id, ts,"
                   " user_id + k * {user} AS user_id, event_type, value,"
                   " props"),
        "documents": ("doc_id + k * {doc} AS doc_id, text, lang, source,"
                      " n_chars"),
        "embeddings": ("vec_id + k * {vec} AS vec_id, embedding, label"),
    }

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied (dim, unreplicated)")

    for t, proj in shifted.items():
        proj = proj.format(**strides)
        con.execute(
            f"COPY (SELECT {proj} FROM read_parquet('{src}/{t}.parquet'),"
            f" (SELECT UNNEST(generate_series(0, {copies - 1})) AS k))"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        (n,) = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()
        print(t, n, "rows")


if __name__ == "__main__":
    main()
