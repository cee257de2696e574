"""HTML -> text extraction — the FIRST stage of every crawl-curation
pipeline (trafilatura/jusText territory), rendered as pure Catalyst
string algebra so it runs JVM-side at 100 TB with no UDF.

The pipeline is the classic rule extractor: drop comments and
``<script>``/``<style>`` subtrees, turn block-closing tags into
newlines, strip remaining tags, decode the six entities that dominate
real markup, and canonicalize whitespace. Every step is a regex or a
literal replace that Java (Spark) and RE2 (DuckDB) interpret
identically — lazy ``.*?``, inline ``(?is)`` flags, ``\\b`` word
boundaries and character classes are common to both dialects, and the
entity pass uses LITERAL ``replace`` (no regex) with ``&amp;`` decoded
last, so ``&amp;lt;`` correctly yields ``&lt;``. Both renderings are
driven by the ONE transform table below (:data:`_STEPS`), so the Spark
expression and the DuckDB twin cannot drift.

Scale shape: a stateless projection — no shuffle, no UDF, fully
pushdown-transparent (filters on other columns still reach the scan);
whole-stage codegen keeps it inside the JVM loop. The regex passes are
linear in the document; nothing is quadratic in markup density.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["html_to_text_expr", "html_to_text_sql", "wrap_as_html_expr",
           "wrap_as_html_sql"]

# (kind, pattern-or-needle, replacement); applied strictly in order.
# kind 're' -> regex replace (Java/RE2-common subset), 'lit' -> literal.
_STEPS: list[tuple[str, str, str]] = [
    # 1. comments and non-content subtrees (lazy spans, dotall)
    ("re", r"(?s)<!--.*?-->", " "),
    ("re", r"(?is)<script\b.*?</script\s*>", " "),
    ("re", r"(?is)<style\b.*?</style\s*>", " "),
    # 2. block-closing tags become hard line breaks
    ("re", r"(?i)<(?:br\s*/?|/p|/div|/li|/h[1-6]|/tr|/table|/ul|/ol)\s*>",
     "\n"),
    # 3. every remaining tag is inline whitespace
    ("re", r"(?s)<[^>]*>", " "),
    # 4. entity decode — literal replaces, &amp; LAST so double-encoded
    #    entities survive exactly one level of decoding
    ("lit", "&nbsp;", " "),
    ("lit", "&lt;", "<"),
    ("lit", "&gt;", ">"),
    ("lit", "&quot;", '"'),
    ("lit", "&#39;", "'"),
    ("lit", "&amp;", "&"),
    # 5. whitespace canonicalization: horizontal runs -> one space,
    #    newline clusters (with surrounding space) -> one newline, trim
    # explicit classes only: Java's \s includes U+000B, RE2's does not,
    # so \s here would make the two dialects diverge on vertical tabs
    ("re", r"[ \t\f\r]+", " "),
    ("re", r" *\n[ \t\f\r\n]*", "\n"),
    ("re", r"^[ \t\f\r\n]+|[ \t\f\r\n]+$", ""),
]


def html_to_text_expr(col: Column | str) -> Column:
    """Spark Column: extract readable text from an HTML string."""
    out = F.col(col) if isinstance(col, str) else col
    for kind, pat, rep in _STEPS:
        if kind == "re":
            out = F.regexp_replace(out, pat, rep)
        else:
            out = F.replace(out, F.lit(pat), F.lit(rep))
    return out


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"


def html_to_text_sql(expr: str) -> str:
    """DuckDB rendering of the identical transform chain ('g' = global
    replace; flags live inline in the pattern, shared with Spark)."""
    out = expr
    for kind, pat, rep in _STEPS:
        if kind == "re":
            out = (
                f"regexp_replace({out}, {_sql_quote(pat)}, "
                f"{_sql_quote(rep)}, 'g')"
            )
        else:
            out = f"replace({out}, {_sql_quote(pat)}, {_sql_quote(rep)})"
    return out


# Synthetic page wrapper for the hash gate: a deterministic function of
# the document text, built identically in both engines, containing the
# hazards the extractor must survive — comments, a script holding a
# fake tag in a string literal, style rules, nested inline tags,
# block structure and double-encoded entities.
_PRE = (
    '<html><!-- crawl:id=9 --><head><style>p{margin:0;color:red}</style>'
    '<script type="text/javascript">var s = "<b>not text</b>"; '
    "if (1 < 2) { s += '&amp;'; }</script></head><body><h1>"
)
_MID = (
    '</h1><div class="main"><p>Lead &amp; summary:&nbsp;<em>'
)
_POST = (
    "</em></p><ul><li>alpha</li><li>beta &lt;tag&gt;</li></ul>"
    '<br/><p>fin &quot;quoted&quot; &#39;q&#39;</p></div></body></html>'
)


def wrap_as_html_expr(text: Column, head_chars: int = 24,
                      body_chars: int = 280) -> Column:
    """Deterministic synthetic page: title = leading ``head_chars`` of
    the text, body = leading ``body_chars``."""
    return F.concat(
        F.lit(_PRE), F.substring(text, 1, head_chars),
        F.lit(_MID), F.substring(text, 1, body_chars),
        F.lit(_POST),
    )


def wrap_as_html_sql(text: str, head_chars: int = 24,
                     body_chars: int = 280) -> str:
    return (
        f"{_sql_quote(_PRE)} || substr({text}, 1, {head_chars}) || "
        f"{_sql_quote(_MID)} || substr({text}, 1, {body_chars}) || "
        f"{_sql_quote(_POST)}"
    )
