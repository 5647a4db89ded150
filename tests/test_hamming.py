"""q481: oracle parity plus a from-scratch Hamming(7,4) replay, and the
double-error mis-correction demonstration (what the code can NOT do)."""

from __future__ import annotations

from tests.conftest import SF_DIR, compare_query


def test_oracle_parity(spark, duck):
    compare_query(spark, duck, "q481_hamming_code_audit")


def _encode(nib):
    b = [(nib >> i) & 1 for i in range(4)]
    p1 = b[0] ^ b[1] ^ b[3]
    p2 = b[0] ^ b[2] ^ b[3]
    p4 = b[1] ^ b[2] ^ b[3]
    return p1 | (p2 << 1) | (b[0] << 2) | (p4 << 3) | (b[1] << 4) | (b[2] << 5) | (b[3] << 6)


def _decode(rw):
    r = [(rw >> i) & 1 for i in range(7)]
    s1 = r[0] ^ r[2] ^ r[4] ^ r[6]
    s2 = r[1] ^ r[2] ^ r[5] ^ r[6]
    s4 = r[3] ^ r[4] ^ r[5] ^ r[6]
    syn = s1 | (s2 << 1) | (s4 << 2)
    if syn:
        rw ^= 1 << (syn - 1)
    f = [(rw >> i) & 1 for i in range(7)]
    return syn, f[2] | (f[4] << 1) | (f[5] << 2) | (f[6] << 3)


def test_q481_theorem_exhaustive_and_rows(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    # the theorem, exhaustively: all 16 nibbles x all 8 error positions
    for nib in range(16):
        cw = _encode(nib)
        for e in range(8):
            rw = cw ^ (1 << (e - 1)) if e else cw
            syn, dec = _decode(rw)
            assert syn == e and dec == nib
    rows = all_queries()["q481_hamming_code_audit"](spark, SF_DIR).collect()
    assert len(rows) == 8 and {r["syndrome"] for r in rows} == set(range(8))
    n = duck.execute("SELECT COUNT(*) FROM customer").fetchone()[0]
    assert sum(r["n"] for r in rows) == n
    for r in rows:
        assert r["all_recovered"] is True
        assert r["n"] == r["n_recovered"] == r["n_syndrome_correct"]


def test_q481_double_error_miscorrects():
    """Single-error codes FAIL double errors — and fail confidently: the
    syndrome points at a third bit and the 'corrected' nibble is wrong."""
    wrong = 0
    for nib in range(16):
        cw = _encode(nib)
        rw = cw ^ 0b11  # flip bits 1 and 2
        syn, dec = _decode(rw)
        assert syn != 0  # it always claims a (wrong) single-bit error
        wrong += dec != nib
    assert wrong > 0
