"""HTML → text extraction — the missing FIRST stage of the
C4/RefinedWeb curation pipeline (r11 verdict item 3): every quality /
repetition / langid operator downstream assumes clean text, but real
crawl data arrives as HTML.

Everything is built-in string expressions (regexp_replace / replace
chains — no UDF, no Generate), so extraction stays inside whole-stage
codegen and the scan prunes to exactly the html column. The chain:

1. drop <script>…</script> and <style>…</style> WITH their contents
   (code is not text; unstripped, a script's ``<`` and ``&&`` would
   corrupt the tag pass),
2. drop <!-- comments -->,
3. strip remaining tags to a space,
4. decode the six common entities (&amp; LAST, so ``&amp;lt;`` decodes
   to the literal text ``&lt;`` — single-pass decode semantics),
5. collapse whitespace and trim.

Boilerplate removal is the classic LINE LINK-DENSITY heuristic
(Kohlschütter et al. 2010 boilerplate detection, simplified): a line
whose visible text is mostly anchor text (nav bars, footers) is
dropped before extraction. Lines are processed with bounded per-row
higher-order functions (filter over split-lines — lambdas are fine on
bounded arrays, CLAUDE.md codegen-boundary rule; a document's line
count is bounded, unlike token streams).

Every builder takes ``dialect`` ∈ {spark, duckdb} and emits the SAME
logic in either engine's SQL, so oracles REPLAY the chain verbatim —
the two dialects differ only mechanically: backslash escaping in
string literals (Spark SQL literals eat one level, DuckDB standard
strings do not), regexp_replace's global flag (Spark is global by
default, DuckDB needs ``'g'``), and list primitives (split/filter/
concat_ws vs string_split/list_filter/array_to_string).

The reference (a Scala event bus) has no text operators at all
(SURVEY.md §2.2); this module is part of the LLM-pipeline surface the
engine adds.
"""

from __future__ import annotations

import pyspark.sql.functions as F

# RE2-compatible patterns (no lookaround, no backrefs) so DuckDB can
# run them unchanged; (?is) inline flags work in both engines.
_SCRIPT_PAT = r"(?is)<script[^>]*>.*?</script>"
_STYLE_PAT = r"(?is)<style[^>]*>.*?</style>"
_COMMENT_PAT = r"(?s)<!--.*?-->"
_TAG_PAT = r"<[^>]*>"
# (\s[^>]*)? requires a word boundary after the 'a' so <abbr>/<aside>/
# <article>/<address> don't count as anchors (r12 ADVICE) — RE2-safe
# (optional group, no lookaround)
_ANCHOR_PAT = r"(?is)<a(\s[^>]*)?>.*?</a>"
_WS_PAT = r"\s+"

_DIALECTS = ("spark", "duckdb")


def _rr(s: str, pat: str, rep: str, dialect: str) -> str:
    """Global regexp_replace in either dialect. Spark SQL string
    literals consume one backslash level (``'\\\\s+'`` → regex ``\\s+``);
    DuckDB standard strings pass backslashes through."""
    p = pat.replace("\\", "\\\\") if dialect == "spark" else pat
    if dialect == "spark":
        return f"regexp_replace({s}, '{p}', '{rep}')"
    return f"regexp_replace({s}, '{p}', '{rep}', 'g')"


def _entities(s: str, dialect: str) -> str:
    """Decode the common entities; &amp; last (single-pass semantics)."""
    e = s
    for frm, to in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&nbsp;", " "),
    ):
        e = f"replace({e}, '{frm}', '{to}')"
    e = f"replace({e}, '&#39;', chr(39))"
    return f"replace({e}, '&amp;', '&')"


def _strip_blocks(s: str, dialect: str) -> str:
    """Drop script/style/comment blocks (contents included) — these may
    span lines, so they go BEFORE any per-line processing."""
    t = _rr(s, _SCRIPT_PAT, " ", dialect)
    t = _rr(t, _STYLE_PAT, " ", dialect)
    return _rr(t, _COMMENT_PAT, " ", dialect)


def _visible(s: str, dialect: str) -> str:
    """Inline-level visible text: strip tags, decode entities, collapse
    whitespace (block drops are the caller's job)."""
    t = _rr(s, _TAG_PAT, " ", dialect)
    t = _entities(t, dialect)
    return f"trim({_rr(t, _WS_PAT, ' ', dialect)})"


def extract_text_sql(col: str, dialect: str = "spark") -> str:
    """Full extraction chain over an HTML column expression."""
    assert dialect in _DIALECTS, dialect
    return _visible(_strip_blocks(col, dialect), dialect)


def extract_text(col: str) -> F.Column:
    """HTML → clean text as ONE spliced expression (py4j budget rule):
    script/style/comment blocks dropped with contents, tags stripped,
    common entities decoded, whitespace collapsed."""
    return F.expr(extract_text_sql(col, "spark"))


def line_link_density_sql(line: str, dialect: str = "spark") -> str:
    """Fraction of a line's visible characters that live inside
    ``<a>…</a>`` elements: length(visible) − length(visible with
    anchors removed), over length(visible). 0 for an empty line."""
    vis = _visible(line, dialect)
    unl = _visible(_rr(line, _ANCHOR_PAT, " ", dialect), dialect)
    return (
        f"(CAST(length({vis}) - length({unl}) AS DOUBLE) / "
        f"greatest(CAST(length({vis}) AS DOUBLE), CAST(1 AS DOUBLE)))"
    )


def drop_boilerplate_sql(
    col: str, dialect: str = "spark", max_density: float = 0.6
) -> str:
    """HTML with boilerplate LINES removed (link density >
    ``max_density``), re-joined with newlines — feed the result to
    :func:`extract_text_sql`. The filter lambda runs over the bounded
    per-document line array (codegen-boundary rule: HOF lambdas stay on
    bounded arrays only)."""
    assert dialect in _DIALECTS, dialect
    pre = _strip_blocks(col, dialect)
    dens = line_link_density_sql("l", dialect)
    if dialect == "spark":
        lines = f"split({pre}, chr(10))"
        kept = f"filter({lines}, l -> {dens} <= {max_density})"
        return f"concat_ws(chr(10), {kept})"
    lines = f"string_split({pre}, chr(10))"
    kept = f"list_filter({lines}, l -> {dens} <= {max_density})"
    # DuckDB array_to_string yields NULL on an empty list where Spark's
    # concat_ws yields '' — coalesce for cross-engine parity
    return f"coalesce(array_to_string({kept}, chr(10)), '')"


def boilerplate_counts_sql(
    col: str, dialect: str = "spark", max_density: float = 0.6
) -> tuple[str, str]:
    """(n_lines, n_boiler) expressions for the same line split."""
    assert dialect in _DIALECTS, dialect
    pre = _strip_blocks(col, dialect)
    dens = line_link_density_sql("l", dialect)
    if dialect == "spark":
        lines = f"split({pre}, chr(10))"
        kept = f"filter({lines}, l -> {dens} <= {max_density})"
        return (
            f"CAST(size({lines}) AS BIGINT)",
            f"CAST(size({lines}) - size({kept}) AS BIGINT)",
        )
    lines = f"string_split({pre}, chr(10))"
    kept = f"list_filter({lines}, l -> {dens} <= {max_density})"
    return (
        f"CAST(len({lines}) AS BIGINT)",
        f"CAST(len({lines}) - len({kept}) AS BIGINT)",
    )
