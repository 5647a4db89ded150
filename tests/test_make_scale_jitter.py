"""make_scale --jitter properties (VERDICT r7 item 7).

Plain replication compresses length/near-dup diversity (every doc
appears k times verbatim), inflating quadratic-join density in sf1
soaks — q287 was killed by the fixture, not the plan, and q412/q440/
q450 slopes carried the artifact note. The jittered generator must be
(a) deterministic, (b) join-key-preserving, (c) copy-0-pristine, and
(d) actually restore diversity: near-source distinct-text rates,
rotation preserving each doc's token multiset, n_chars consistent,
events row-drop bounded, embeddings de-duplicated.
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def jittered(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("jit") / "out")
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_scale.py"),
            SRC,
            dst,
            "10",
            "--jitter",
        ],
        check=True,
        capture_output=True,
        timeout=300,
    )
    return dst


def test_documents_diversity_and_consistency(jittered):
    con = duckdb.connect()
    n, distinct = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT text) FROM"
        f" read_parquet('{jittered}/documents.parquet')"
    ).fetchone()
    (src_n,) = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()
    assert n == 10 * src_n
    # plain replication would give distinct == src_n (10% of rows);
    # jitter must push it near-unique
    assert distinct > 0.9 * n
    (bad,) = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{jittered}/documents.parquet')"
        f" WHERE n_chars != length(text)"
    ).fetchone()
    assert bad == 0


def test_copy0_pristine_and_keys_shifted(jittered):
    con = duckdb.connect()
    # copy 0 must be byte-identical to the source
    (diff,) = con.execute(
        f"""
        SELECT COUNT(*) FROM (
          SELECT * FROM read_parquet('{SRC}/documents.parquet')
          EXCEPT
          SELECT * FROM read_parquet('{jittered}/documents.parquet')
        )"""
    ).fetchone()
    assert diff == 0
    # every copy contributes a full key block (stride = next power of 10)
    (nblocks,) = con.execute(
        f"""
        SELECT COUNT(DISTINCT block) FROM (
          SELECT doc_id // (SELECT CAST(POWER(10, CEIL(LOG10(MAX(doc_id)
                            + 1))) AS BIGINT)
                            FROM read_parquet('{SRC}/documents.parquet'))
                 AS block
          FROM read_parquet('{jittered}/documents.parquet'))"""
    ).fetchone()
    assert nblocks == 10


def test_rotation_preserves_token_multiset(jittered):
    con = duckdb.connect()
    # a copy whose token COUNT equals its source doc's had no tail drop
    # (d=0), so rotation-only applies: its sorted token list must equal
    # the source's. (Two d>0 copies can share a length with different
    # multisets — different tails dropped — so compare vs copy 0 only.)
    (bad,) = con.execute(
        f"""
        WITH s AS (
          SELECT doc_id AS base,
                 list_sort(string_split(text, ' ')) AS st,
                 len(string_split(text, ' ')) AS n
          FROM read_parquet('{SRC}/documents.parquet')),
        j AS (
          SELECT doc_id % (SELECT CAST(POWER(10, CEIL(LOG10(MAX(doc_id)
                           + 1))) AS BIGINT)
                           FROM read_parquet('{SRC}/documents.parquet'))
                 AS base,
                 list_sort(string_split(text, ' ')) AS st,
                 len(string_split(text, ' ')) AS n
          FROM read_parquet('{jittered}/documents.parquet'))
        SELECT COUNT(*) FROM j JOIN s USING (base)
        WHERE j.n = s.n AND j.st != s.st"""
    ).fetchone()
    assert bad == 0


def test_events_drop_bounded_and_embeddings_distinct(jittered):
    con = duckdb.connect()
    (src_ev,) = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()
    (jit_ev,) = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{jittered}/events.parquet')"
    ).fetchone()
    # copy0 intact + 9 copies at ~15/16 retention
    assert 10 * src_ev * 0.90 < jit_ev < 10 * src_ev
    n, distinct = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT embedding::VARCHAR)"
        f" FROM read_parquet('{jittered}/embeddings.parquet')"
    ).fetchone()
    assert distinct > 0.9 * n
    # element type must survive as float32 (Spark array<float>)
    typ = con.execute(
        f"DESCRIBE SELECT embedding FROM"
        f" read_parquet('{jittered}/embeddings.parquet')"
    ).fetchall()[0][1]
    assert typ == "FLOAT[]"


def test_deterministic_regeneration(jittered, tmp_path):
    dst2 = str(tmp_path / "again")
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_scale.py"),
            SRC,
            dst2,
            "10",
            "--jitter",
        ],
        check=True,
        capture_output=True,
        timeout=300,
    )
    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        (diff,) = con.execute(
            f"""
            SELECT COUNT(*) FROM (
              SELECT * FROM read_parquet('{jittered}/{t}.parquet')
              EXCEPT
              SELECT * FROM read_parquet('{dst2}/{t}.parquet'))"""
        ).fetchone()
        assert diff == 0, t
