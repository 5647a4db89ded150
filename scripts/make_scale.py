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

``--jitter`` (VERDICT r7 item 7): plain replication compresses
length/near-dup diversity — every document/embedding/user-sequence
appears ``copies`` times VERBATIM, so LSH candidate density, same-length
join-band density, and exact-dup rates are inflated ~``copies``x over
what a real 10x crawl shows, and quadratic-join soaks (q287, and the
q412/q440/q450 slope notes) measure the fixture, not the plan. With the
flag, copy 0 stays pristine and each copy k>0 gets a hash-seeded,
join-key-preserving perturbation:

* documents: token-list ROTATION by ``hash(doc_id,k) % n`` followed by
  a stride-2 RIFFLE (odd positions then even). Rotation alone is nearly
  identity for 3-gram shingles (only the ~4 boundary shingles change,
  so MinHash-similarity between copies stays ~0.95 and shingle-based
  near-dup lineages keep the inflated density); the riffle is a real
  permutation that destroys almost every shingle while still preserving
  the token multiset per doc (corpus token stats unchanged). A 0-3
  token tail drop adds length jitter; ``n_chars`` recomputed.
* events: ~1/16 of copy-k rows dropped by event hash -> per-user
  sequence lengths vary across copies (q287's length bands spread out).
* embeddings: a per-row additive offset of up to +/-0.1 on every
  component (breaks exact duplication and cosine==1 ties across
  copies; a multiplicative jitter would be invisible to cosine).

Usage: python scripts/make_scale.py [src_dir] [dst_dir] [copies] [--jitter]
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
    args = [a for a in sys.argv[1:] if a != "--jitter"]
    jitter = "--jitter" in sys.argv[1:]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    dst = args[1] if len(args) > 1 else ".scratch/sf1"
    copies = int(args[2]) if len(args) > 2 else 10
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

    # --jitter: copy-k>0 perturbations, all hash-seeded from (key, k) so
    # regeneration is deterministic; join keys and copy-0 rows untouched.
    jitter_sql = {
        # token rotation + stride-2 riffle (both multiset-preserving
        # permutations; the riffle is what actually breaks shingles)
        # + 0-3 token tail drop
        "documents": f"""
            SELECT doc_id,
                   CASE WHEN k = 0 THEN text ELSE jt END AS text,
                   lang, source,
                   CASE WHEN k = 0 THEN n_chars
                        ELSE length(jt) END AS n_chars
            FROM (
              SELECT doc_id, text, lang, source, n_chars, k,
                     array_to_string(
                       list_slice(
                         list_concat(list_slice(rot, 1, n, 2),
                                     list_slice(rot, 2, n, 2)),
                         1, greatest(1, n - d)), ' ') AS jt
              FROM (
              SELECT doc_id + k * {strides['doc']} AS doc_id, text, lang,
                     source, n_chars, k, n, d,
                     list_concat(list_slice(tk, r + 1, n),
                                 list_slice(tk, 1, r)) AS rot
              FROM (
                SELECT *, len(tk) AS n,
                       CAST(hash(doc_id * 1000003 + k)
                            % greatest(len(tk), 1) AS INT) AS r,
                       CAST(hash(doc_id * 999983 + k * 31 + 7)
                            % 4 AS INT) AS d
                FROM (
                  SELECT d.*, g.k, string_split(d.text, ' ') AS tk
                  FROM read_parquet('{src}/documents.parquet') d,
                       (SELECT UNNEST(generate_series(0, {copies - 1}))
                        AS k) g))))
        """,
        # ~1/16 row drop per copy -> per-user sequence-length diversity
        "events": f"""
            SELECT event_id + k * {strides['event']} AS event_id, ts,
                   user_id + k * {strides['user']} AS user_id, event_type,
                   value, props
            FROM read_parquet('{src}/events.parquet'),
                 (SELECT UNNEST(generate_series(0, {copies - 1})) AS k)
            WHERE k = 0 OR hash(event_id * 2654435761 + k) % 16 != 0
        """,
        # additive per-row offset (multiplicative would preserve cosine)
        "embeddings": f"""
            SELECT vec_id + k * {strides['vec']} AS vec_id,
                   CASE WHEN k = 0 THEN embedding
                        ELSE list_transform(embedding, x -> CAST(
                          x + (CAST(hash(vec_id * 1000003 + k) % 201 AS INT)
                               - 100) * 0.001 AS FLOAT)) END AS embedding,
                   label
            FROM read_parquet('{src}/embeddings.parquet'),
                 (SELECT UNNEST(generate_series(0, {copies - 1})) AS k)
        """,
    }

    for t, proj in shifted.items():
        proj = proj.format(**strides)
        if jitter and t in jitter_sql:
            inner = jitter_sql[t]
        else:
            inner = (
                f"SELECT {proj} FROM read_parquet('{src}/{t}.parquet'),"
                f" (SELECT UNNEST(generate_series(0, {copies - 1})) AS k)"
            )
        con.execute(f"COPY ({inner}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        (n,) = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()
        print(t, n, "rows")


if __name__ == "__main__":
    main()
