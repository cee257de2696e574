"""HTML -> text extraction (extras/html.py): rule semantics plus the
cross-dialect contract — the ONE transform table renders to a Spark
Column chain and a DuckDB SQL chain that must agree string-exactly."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mpes_spark.extras.html import (
    html_to_text_expr,
    html_to_text_sql,
    wrap_as_html_expr,
    wrap_as_html_sql,
)

CASES = [
    # script content (including fake tags in string literals) is gone
    ('<p>a</p><script>var x = "<b>no</b>";</script><p>b</p>', "a\nb"),
    # style subtree gone, comment gone
    ("<style>p{x:1}</style><!-- hidden -->visible", "visible"),
    # block closers become newlines, inline tags become spaces
    ("<h1>T</h1><div><p>one</p><p>two <em>three</em></p></div>",
     "T\none\ntwo three"),
    # entity decode, &amp; LAST: one level of decoding only
    ("&amp;lt; &lt; &gt; &quot; &#39; &nbsp;x", "&lt; < > \" ' x"),
    # whitespace canonicalization
    ("a\t\t b\r\n   c  <br> d", "a b\nc\nd"),
    # unclosed / angle garbage is treated as a tag by both dialects
    ("keep <notatag attr=1> this", "keep this"),
]


@pytest.mark.parametrize("html,want", CASES)
def test_rule_semantics_spark(spark, html, want):
    df = spark.createDataFrame([(html,)], "h string")
    got = df.select(html_to_text_expr(F.col("h")).alias("t")).first().t
    assert got == want


@pytest.mark.parametrize("html,want", CASES)
def test_rule_semantics_duckdb(html, want):
    sql = html_to_text_sql("h")
    got = duckdb.sql(
        f"SELECT {sql} AS t FROM (VALUES ($${html}$$)) v(h)"
    ).fetchone()[0]
    assert got == want


def test_wrapper_round_trip_cross_engine(spark):
    """The synthetic-page wrapper + extractor agree string-exactly
    across engines for hazard-bearing doc texts (the gate's shape)."""
    texts = [
        "plain words only",
        "",
        "with & amp < angle > and 'q' \"qq\"",
        "x" * 400,  # longer than both wrapper windows
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = (
        df.select(
            "doc_id",
            html_to_text_expr(wrap_as_html_expr(F.col("text"))).alias("t"),
        )
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO d VALUES (?, ?)", list(enumerate(texts)))
    want = con.execute(
        f"SELECT doc_id, {html_to_text_sql(wrap_as_html_sql('text'))} AS t "
        "FROM d ORDER BY doc_id"
    ).df()
    assert got["t"].tolist() == want["t"].tolist()
