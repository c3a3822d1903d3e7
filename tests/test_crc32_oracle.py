"""r12: the crc32 replay (suite_entries._crc32_sql) is now
correctness-critical oracle machinery — d03/d05/d20's oracles replay
the PRODUCTION crc32 kernels through it. Pin it against zlib.crc32
directly, independent of any corpus."""

import zlib

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from arrow_zarr_spark.operators.suite_entries import (
    _crc32_sql,
    _crc32_table_sql,
)

ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=127),
    max_size=64,
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _crc_of(con, values):
    vals = ", ".join("(?)" for _ in values)
    q = (
        f"WITH crct AS (SELECT {_crc32_table_sql()} AS tb), "
        f"w AS (SELECT * FROM (VALUES {vals}) v(s)) "
        f"SELECT s, {_crc32_sql('s')} AS crc FROM w, crct"
    )
    return dict(con.execute(q, list(values)).fetchall())


@settings(max_examples=30, deadline=None)
@given(st.lists(ASCII_TEXT, min_size=1, max_size=20, unique=True))
def test_crc32_sql_matches_zlib(duck, strings):
    got = _crc_of(duck, strings)
    for s in strings:
        assert got[s] == zlib.crc32(s.encode()), repr(s)


def test_crc32_table_is_the_ieee_table():
    """The embedded table must be the reflected-0xEDB88320 byte table
    zlib consults — derived here a second way (bit-at-a-time over
    each byte) so a generator typo can't self-confirm."""
    lit = _crc32_table_sql()
    body = lit[lit.index("[") + 1 : lit.index("]")]
    tbl = [int(x) for x in body.split(",")]
    assert len(tbl) == 256
    for byte in range(256):
        crc = byte
        for _ in range(8):
            crc = (crc >> 1) ^ (0xEDB88320 * (crc & 1))
        assert tbl[byte] == crc
    # and end-to-end: table-driven CRC of a known vector
    crc = 0xFFFFFFFF
    for b in b"123456789":
        crc = (crc >> 8) ^ tbl[(crc ^ b) & 0xFF]
    assert (crc ^ 0xFFFFFFFF) == 0xCBF43926  # the CRC-32 check value


def test_compound_operand_parenthesized(duck):
    """The r12 precedence trap: for a compound operand the subscript
    must bind to the whole expression, not the last literal
    (w || '#'[i] reads bytes of '#', silently corrupting the hash)."""
    operand = "'word' || '#'"
    q = (
        f"WITH crct AS (SELECT {_crc32_table_sql()} AS tb) "
        f"SELECT {_crc32_sql(operand)} FROM crct"
    )
    assert duck.execute(q).fetchone()[0] == zlib.crc32(b"word#")
    assert _crc_of(duck, ["word"])["word"] == zlib.crc32(b"word")


def test_simhash_oracle_degenerate_docs(spark, duck):
    """r13 (the ADVICE latent-break fix): empty-text and NULL-text
    docs must hash-match between the production kernel and the d05
    oracle — the kernel emits signature 0 for both; the oracle now
    excludes them from tokenization and unions them back at 0."""
    from arrow_zarr_spark.operators import dedup
    from arrow_zarr_spark.operators.suite_entries import (
        _simhash64_oracle_sql,
    )

    rows = [
        (0, "red fox jumps"),
        (1, ""),
        (2, None),
        (3, "red fox jumps"),
        (4, "lone"),
        (5, ""),  # two empties + a NULL group together at 0
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["simhash"]: (r["doc_id"], r["n_docs"])
        for r in dedup.simhash_dedup(sdf).collect()
    }
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ", ".join(
                f"({i}, {'NULL' if t is None else repr(t)})"
                for i, t in rows
            )
            + ") v(doc_id, text)"
        )
        want = {
            sig: (doc, n)
            for sig, doc, n in con.execute(
                _simhash64_oracle_sql()
            ).fetchall()
        }
    finally:
        con.close()
    assert got == want
    assert got[0] == (1, 3)  # the degenerate docs: min id 1, 3 docs
