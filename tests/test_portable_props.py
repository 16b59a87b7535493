"""Property tests for the dialect-portable expression builders: the
ENTIRE oracle methodology rests on these emitting arithmetic that
Spark and DuckDB evaluate to identical bits. Random inputs (including
unicode, quotes, whitespace runs, empty-ish strings) are pushed
through both engines and compared cell-for-cell."""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from streaming_parquet_spark.functions.portable import (
    hash_bucket_expr,
    hex_to_i32,
    minhash_expr,
    n_words_expr,
    simhash_expr,
    word_hashes_expr,
    words_expr,
)

# printable-ish text incl. unicode, no backslashes/quotes (SQL literal
# escaping is the CALLER's concern — queries pass column refs, never
# user literals)
_texts = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), blacklist_characters="'\"\\"
    ),
    min_size=0,
    max_size=60,
)


def _duck_eval(sql: str):
    return duckdb.connect().execute(sql).fetchall()


@settings(max_examples=20, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=8))
def test_word_pipeline_hashes_agree(spark, texts):
    """words -> md5 -> hex_to_i32 -> minhash/simhash agree between
    Spark and DuckDB on arbitrary text."""
    sdf = spark.createDataFrame([(t,) for t in texts], "t string")
    s_words = words_expr("spark", "t")
    s_hash = word_hashes_expr("spark", s_words)
    s_rows = sdf.select(
        F.expr(n_words_expr("spark", "t")).alias("nw"),
        F.expr(minhash_expr("spark", s_hash, 4)).alias("mh"),
        F.expr(simhash_expr("spark", s_hash, 16)).alias("sh"),
    ).collect()

    d_words = words_expr("duckdb", "t")
    d_hash = word_hashes_expr("duckdb", d_words)
    con = duckdb.connect()
    con.execute("CREATE TABLE tt (t VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?)", [(t,) for t in texts])
    d_rows = con.execute(
        f"SELECT {n_words_expr('duckdb', 't')} AS nw,"
        f" {minhash_expr('duckdb', d_hash, 4)} AS mh,"
        f" {simhash_expr('duckdb', d_hash, 16)} AS sh FROM tt"
    ).fetchall()

    for s, d in zip(s_rows, d_rows):
        assert s["nw"] == d[0]
        assert s["mh"] == d[1]
        assert s["sh"] == d[2]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40),
             min_size=1, max_size=16),
    st.sampled_from([100, 1000, 1_000_000]),
    st.sampled_from([0, 2, 11]),
)
def test_hash_bucket_agrees(spark, ids, buckets, seed):
    sdf = spark.createDataFrame([(i,) for i in ids], "id long")
    s_rows = [
        r[0]
        for r in sdf.select(
            F.expr(hash_bucket_expr("spark", "id", buckets, seed=seed))
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE ti (id BIGINT)")
    con.executemany("INSERT INTO ti VALUES (?)", [(i,) for i in ids])
    d_rows = [
        r[0]
        for r in con.execute(
            f"SELECT {hash_bucket_expr('duckdb', 'id', buckets, seed=seed)}"
            " FROM ti"
        ).fetchall()
    ]
    assert s_rows == d_rows
    assert all(0 <= b < buckets for b in s_rows)


def test_hex_to_i32_range_and_agreement(spark):
    """md5-derived 32-bit hashes agree and cover [0, 2^32)."""
    vals = [f"v{i}" for i in range(200)] + ["", " ", "ü", "日本語"]
    sdf = spark.createDataFrame([(v,) for v in vals], "v string")
    s = [
        r[0]
        for r in sdf.select(F.expr(hex_to_i32("md5(v)"))).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE tv (v VARCHAR)")
    con.executemany("INSERT INTO tv VALUES (?)", [(v,) for v in vals])
    d = [
        r[0]
        for r in con.execute(
            f"SELECT {hex_to_i32('md5(v)')} FROM tv"
        ).fetchall()
    ]
    assert s == d
    assert all(0 <= h < 2**32 for h in s)
    assert len(set(s)) == len(vals)  # no collisions on this tiny set
