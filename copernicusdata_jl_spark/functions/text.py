"""Deterministic text kernels: HTML→text extraction, language ID, quality
scoring, token counting, winnowing fingerprints.

The extractor is the engine's per-row invariant gate: byte-identical ``text``
per ``url`` across runs/partitions/parallelism (BASELINE.json input hint).
It is pure (no locale, wall-clock, or library-version dependence — a fixed
regex pipeline), runs as an Arrow-batched pandas UDF, and has an
independently-written ANSI-SQL twin (:func:`extract_text_sql`) so any SQL
engine can oracle the digests.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Deterministic synthetic HTML (fixture twin of the extractor)
# ---------------------------------------------------------------------------

WORDS = (
    "granule tile orbit sensor radiance pixel swath nadir band mask cloud "
    "ocean land coast river delta plain ridge basin crater dune reef atoll "
    "fjord steppe tundra taiga karst mesa butte playa wadi arroyo cirque "
    "moraine esker drumlin kame kettle loess"
).split()


def _sentence(i: int, k: int) -> str:
    n = 5 + (i + k) % 7
    return " ".join(WORDS[(i * 7 + k * 13 + j * 3) % len(WORDS)] for j in range(n)) + "."


def render_html(i: int) -> str:
    """Deterministic page HTML for document ``i`` (byte-exact per i)."""
    paras = "".join(f"<p>{_sentence(i, k)}</p>" for k in range(1 + i % 3))
    return (
        f"<html><head><title>doc {i}</title><meta charset=\"utf-8\"/>"
        f"<style>p{{margin:0}}</style></head>"
        f"<body><h1>Document {i}</h1>{paras}"
        f"<script>var x={i};</script></body></html>"
    )


def expected_text(i: int) -> str:
    """Golden extractor output for ``render_html(i)`` — written independently
    of the extractor so tests compare two derivations."""
    paras = " ".join(_sentence(i, k) for k in range(1 + i % 3))
    return f"doc {i} Document {i} {paras}"


# ---------------------------------------------------------------------------
# Extractor — Arrow-batched, pure regex pipeline
# ---------------------------------------------------------------------------

# Tag-name boundary written as an explicit ASCII negative lookahead
# (?![0-9A-Za-z_]) rather than \b: Python \b is Unicode-aware and Java \b is
# ASCII in this position, so the same pattern text would diverge on inputs
# like "<scripté" — the lookahead is identical ASCII semantics in both.
#
# Pass fusion (bandwidth, r2+r3): script/style-block removal, tag-strip and
# whitespace-collapse all fuse into ONE alternation pass replacing each
# maximal run of (script-block ∪ style-block ∪ tag ∪ ws char) with a single
# space. Equivalence to the sequential strip-blocks → strip-tags →
# collapse-ws derivation: a block can only start at a '<', where the fused
# alternation tries the block alternatives FIRST (same priority the
# sequential blocks-pass had globally), and a failed block opener falls
# through to the generic-tag alternative exactly as the sequential pass 2
# would — so match starts and preferences coincide position-by-position on
# ANY input, well-formed or not (pinned by the three-way parity tests +
# DuckDB oracle). Why it matters: each regexp pass on the JVM pays a
# UTF8→UTF-16→UTF8 round trip over the whole page; the extractor dominates
# the flagship wall (measured ~80% at 2M pages), and one fused pass halves
# that traffic vs r2's two passes. Overlapping <script>/<style> blocks
# resolve leftmost-first (unchanged from r2; all four derivations move
# together).
# The pattern is tuned for the backtracking engines (Java util.regex, Python
# re ≥3.11) without changing the language matched: whitespace-run first (ws
# can never start a block/tag, so priority is unaffected and the most common
# element is the cheapest test), the '<' factored out of the three tag
# alternatives (tested once per position instead of three times), and
# possessive quantifiers where the quantified class excludes the following
# delimiter ([^>]*+> — no give-back is ever needed, so no backtrack frames).
# The DuckDB twin keeps plain greedy quantifiers (RE2 has no possessive and
# never backtracks anyway) — same language, pinned by the oracle. Measured
# at 2M rich pages, local[16]: sequential two-pass 31.5s → fused 29.5s →
# this form 23.7s for the extraction stage.
_BOUND = r"(?![0-9A-Za-z_])"
_RE_EXTRACT = re.compile(
    rf"(?:[ \t\n\r\f]++|<(?:script{_BOUND}[^>]*+>.*?</script>"
    rf"|style{_BOUND}[^>]*+>.*?</style>|[^>]*+>))+",
    re.S | re.I,
)
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def extract_text_py(html: str) -> str:
    """Pure-Python single-string extractor (the specification).

    Edge trimming is explicitly ASCII-space-only (``strip(" ")``): Python's
    bare ``str.strip()`` also removes \\x0b and Unicode whitespace (NBSP …)
    that the collapse class leaves behind, while Spark ``trim()`` removes
    only 0x20 — pinning both to ASCII space keeps the python/pandas/JVM
    paths byte-identical on real-world whitespace (see ADVICE r1)."""
    s = _RE_EXTRACT.sub(" ", html)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s.strip(" ")


def extract_text_batch(html: pd.Series) -> pd.Series:
    """Vectorized pandas twin (str accessor = C-loop over the batch).

    Binary input decodes with errors="replace" (U+FFFD), matching the JVM
    path's cast-to-string behavior on invalid UTF-8 rather than raising.
    NOTE: exact FFFD *counts* for malformed multi-byte sequences can differ
    between the JVM and Python decoders, so digest parity is guaranteed only
    for valid-UTF-8 input; the JVM expression (jvm=True) is the canonical
    digest path."""
    s = html
    if len(s) and isinstance(s.iloc[0], (bytes, bytearray)):
        s = s.str.decode("utf-8", errors="replace")
    s = s.astype("string")
    s = s.str.replace(_RE_EXTRACT, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    return s.str.strip(" ")


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_text_batch(html)


def extract_text_expr(html: Column) -> Column:
    """JVM-side extractor twin: the same fixed regex pipeline as
    :func:`extract_text_py`, built from Catalyst ``regexp_replace`` /
    ``replace`` so it runs inside whole-stage codegen — no Arrow transfer,
    no python workers. Byte-identical to the pandas kernel (asserted in
    tests/test_text.py three ways: python spec == pandas batch == this
    expression). This is the production path: on this host the Arrow
    round-trip for ~3 KB pages costs more CPU than the extraction itself,
    and at 10^12 docs keeping the hot loop in codegen removes the python
    worker fleet entirely. The pandas kernel remains the specification and
    the fallback for extractors that genuinely need Python.

    Accepts string or binary input (binary is decoded as UTF-8 first,
    matching the pages schema ``html:binary``). Parity contract: byte-
    identical to the python/pandas kernels for valid-UTF-8 input — the tag
    boundary is an explicit ASCII lookahead and edge trimming is ASCII-space
    only on every path, so Unicode whitespace (NBSP, \\x0b, …) flows through
    all three identically. On INVALID UTF-8 bytes this JVM path is the
    canonical one for ``text_sha256`` (Python's replacement-char policy may
    emit different U+FFFD counts)."""
    s = html.cast("string")
    s = F.regexp_replace(
        s,
        r"(?is)(?:[ \t\n\r\f]++|<(?:script(?![0-9A-Za-z_])[^>]*+>.*?</script>"
        r"|style(?![0-9A-Za-z_])[^>]*+>.*?</style>|[^>]*+>))+",
        " ",
    )
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(s)


def with_extracted_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text", jvm: bool = True
) -> DataFrame:
    """Attach extracted text + sha256 digest columns. ``jvm`` picks the
    codegen expression extractor (default); ``jvm=False`` runs the
    Arrow-batched pandas kernel (byte-identical output)."""
    ext = extract_text_expr(F.col(html_col)) if jvm else extract_text_udf(F.col(html_col))
    return df.withColumn(out_col, ext).withColumn(
        f"{out_col}_sha256", F.sha2(F.col(out_col), 256)
    )


def extract_text_sql(html_expr: str) -> str:
    """ANSI-SQL twin of the extractor (DuckDB/RE2-compatible), used as the
    independent oracle for digest parity. Mirrors extract_text_py exactly
    for HTML without nested/malformed tags. RE2 lacks lookahead, so the
    ASCII tag boundary is the equivalent alternation (>| non-word char);
    same single fused pass as the engine (script|style blocks, tags, ws)."""
    s = (
        f"regexp_replace({html_expr}, "
        f"'([ \\t\\n\\r\\f]|<(script(>|[^>0-9A-Za-z_][^>]*>).*?</script>"
        f"|style(>|[^>0-9A-Za-z_][^>]*>).*?</style>"
        f"|[^>]*>))+'"
        f", ' ', 'gsi')"
    )
    for ent, ch in _ENTITIES:
        ch_sql = ch.replace("'", "''")
        s = f"replace({s}, '{ent}', '{ch_sql}')"
    # trim(x, ' '): DuckDB's one-arg trim strips Unicode whitespace; the
    # engine contract is ASCII-space-only edges on every path
    return f"trim({s}, ' ')"


# ---------------------------------------------------------------------------
# Language ID (n-gram/stopword heuristic) — portable column expressions
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "fr": [" le ", " la ", " et "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " los ", " y "],
    "pt": [" o ", " os ", " e "],
}


def _count_occurrences_sql(text_expr: str, needle: str) -> str:
    n = needle.replace("'", "''")
    return f"CAST((length({text_expr}) - length(replace({text_expr}, '{n}', ''))) / {len(needle)} AS BIGINT)"


def lang_score_sql(text_expr: str, lang: str) -> str:
    """Marker-hit count for one language over lowercase padded text."""
    padded = f"(' ' || lower({text_expr}) || ' ')"
    return "(" + " + ".join(_count_occurrences_sql(padded, m) for m in LANG_MARKERS[lang]) + ")"


def lang_score_expr(text: Column, lang: str) -> Column:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    score = F.lit(0).cast("long")
    for m in LANG_MARKERS[lang]:
        score = score + ((F.length(padded) - F.length(F.replace(padded, F.lit(m), F.lit("")))) / len(m)).cast("long")
    return score


# ---------------------------------------------------------------------------
# Quality / tokens — portable column expressions
# ---------------------------------------------------------------------------


def token_count_expr(text: Column) -> Column:
    """Whitespace token count after collapse; JVM-side."""
    norm = F.trim(F.regexp_replace(text, "[ \\t\\n\\r\\f]+", " "))
    return F.when(F.length(norm) == 0, F.lit(0).cast("long")).otherwise(
        F.length(norm) - F.length(F.replace(norm, F.lit(" "), F.lit(""))) + 1
    ).cast("long")


def token_count_sql(text_expr: str) -> str:
    norm = f"trim(regexp_replace({text_expr}, '[ \\t\\n\\r\\f]+', ' ', 'g'))"
    return (
        f"CAST(CASE WHEN length({norm}) = 0 THEN 0 ELSE "
        f"length({norm}) - length(replace({norm}, ' ', '')) + 1 END AS BIGINT)"
    )


def quality_score_expr(text: Column) -> Column:
    """Length/terminal-punctuation/word-shape heuristic in [0,1]; JVM-side.

    score = 0.4·min(1, chars/500) + 0.3·min(1, tokens/100)
          + 0.3·(ends with sentence punctuation)."""
    chars = F.length(text).cast("double")
    toks = token_count_expr(text).cast("double")
    ends = F.when(F.regexp_like(F.rtrim(text), F.lit("[.!?]$")), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(
        F.lit(0.4) * F.least(F.lit(1.0), chars / 500.0)
        + F.lit(0.3) * F.least(F.lit(1.0), toks / 100.0)
        + F.lit(0.3) * ends,
        6,
    )


def quality_score_sql(text_expr: str) -> str:
    chars = f"CAST(length({text_expr}) AS DOUBLE)"
    toks = f"CAST({token_count_sql(text_expr)} AS DOUBLE)"
    ends = f"(CASE WHEN regexp_matches(rtrim({text_expr}), '[.!?]$') THEN 1.0 ELSE 0.0 END)"
    return (
        f"round(0.4 * least(1.0, {chars} / 500.0)"
        f" + 0.3 * least(1.0, {toks} / 100.0)"
        f" + 0.3 * {ends}, 6)"
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprint (rolling hash) — Arrow-batched kernel
# ---------------------------------------------------------------------------


def repetition_ratio_expr(text: Column, n: int = 3) -> Column:
    """Gopher-style within-document repetition signal (Rae et al. 2021
    quality rules): 1 - distinct(n-grams)/total(n-grams) over single-space
    tokens — boilerplate and spam repeat phrases, prose does not. Same
    slice+zip_with gram construction as operators/dedup.word_ngrams_expr
    but WITHOUT the distinct (the ratio needs raw gram counts); pure array
    ops, no explode, no shuffle. NULL/short text scores 0.0."""
    toks = F.split(text, " ")
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, cnt)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, j + 1, cnt), lambda x, y: F.concat_ws(" ", x, y)
        )
    total = F.size(grams).cast("double")
    return F.coalesce(
        F.when(
            total > 0,
            F.round(1.0 - F.size(F.array_distinct(grams)).cast("double") / total, 6),
        ).otherwise(F.lit(0.0)),
        F.lit(0.0),
    )


def repetition_ratio_sql(text_expr: str, n: int = 3) -> str:
    """DuckDB twin: same single-space tokens, same non-distinct grams."""
    toks = f"string_split({text_expr}, ' ')"
    gram = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(n))
    grams = (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n - 2}), i -> {gram}) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )
    return (
        f"CASE WHEN {text_expr} IS NOT NULL AND len({grams}) > 0 THEN "
        f"round(1.0 - CAST(len(list_distinct({grams})) AS DOUBLE) / CAST(len({grams}) AS DOUBLE), 6) "
        f"ELSE 0.0 END"
    )


# polynomial rolling-hash parameters: Horner fold (h*B + codepoint) mod M.
# M = 2^31-1 keeps every intermediate < 2^40 (BIGINT-safe in both NumPy
# int64 and DuckDB), B = 257 > any byte value.
_WIN_B, _WIN_M = 257, 2_147_483_647


def _winnow_normalize(text: str) -> str:
    return re.sub(r"[ \t\n\r\f]+", " ", text.lower()).strip(" ")


def winnow_fingerprints_batch(texts: list[str], k: int = 8, w: int = 12) -> list[list[int]]:
    """Winnowing (Schleimer et al. 2003) over a WHOLE Arrow batch: min hash
    per window of k-gram polynomial rolling hashes (VERDICT r2 #7 — the
    previous kernel ran python md5 per k-gram inside the batch).

    The k-gram hash is a base-257 Horner fold of unicode codepoints mod
    2^31-1 — identical arithmetic to the DuckDB oracle twin
    (:func:`winnow_table_sql`, nested-Horner SQL over ``unicode(s[j+m])``).
    Hashing is batch-level NumPy: every document's normalized codepoints
    are concatenated once and ALL gram hashes fall out of k vectorized
    passes over the concatenated array (grams straddling document
    boundaries are simply never read — each document only slices its own
    positions). The per-document remainder is the sliding-window minimum +
    distinct, also NumPy. Edges are ASCII-space trimmed like the extractor;
    docs shorter than k contribute no fingerprints."""
    norm = [_winnow_normalize(t or "") for t in texts]
    lens = np.array([len(t) for t in norm], dtype=np.int64)
    cp = np.frombuffer("".join(norm).encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    n_all = cp.shape[0] - k + 1
    if n_all > 0:
        hall = np.zeros(n_all, dtype=np.int64)
        for m in range(k):
            hall = (hall * _WIN_B + cp[m : m + n_all]) % _WIN_M
    else:
        hall = np.empty(0, dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    out: list[list[int]] = []
    for d in range(len(norm)):
        n = int(lens[d]) - k + 1
        if n <= 0:
            out.append([])
        elif n <= w:
            out.append([int(hall[offs[d] : offs[d] + n].min())])
        else:
            win = np.lib.stride_tricks.sliding_window_view(hall[offs[d] : offs[d] + n], w)
            out.append(sorted(set(win.min(axis=1).tolist())))
    return out


def winnow_fingerprints(text: str, k: int = 8, w: int = 12) -> list[int]:
    """Single-document convenience wrapper over the batch kernel."""
    return winnow_fingerprints_batch([text], k, w)[0]


@F.pandas_udf(T.ArrayType(T.LongType()))
def winnow_udf(text: pd.Series) -> pd.Series:
    return pd.Series(winnow_fingerprints_batch(text.tolist()), index=text.index)


def winnow_table_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", k: int = 8, w: int = 12
) -> str:
    """DuckDB twin of :func:`winnow_fingerprints_batch` over a whole table —
    identical normalization, base-257 Horner codepoint hashes mod 2^31-1
    (nested fixed-depth expression, one ``unicode(s[j+m])`` per gram
    position), sliding-window minima, distinct+sort — exploded to (id, fp)
    rows (docs shorter than k contribute none)."""
    s = f"trim(regexp_replace(lower({text_col}), '[ \\t\\n\\r\\f]+', ' ', 'g'), ' ')"
    gram = "CAST(0 AS BIGINT)"
    for m in range(k):
        gram = f"(({gram}) * {_WIN_B} + unicode(s[j + {m}])) % {_WIN_M}"
    return f"""
WITH t AS (SELECT {id_col}, {s} AS s FROM {table}),
h AS (
  SELECT {id_col},
         list_transform(range(1, length(s) - {k} + 2), j -> {gram}) AS hs
  FROM t WHERE length(s) >= {k}
),
m AS (
  SELECT {id_col},
         CASE WHEN len(hs) <= {w} THEN [list_min(hs)]
              ELSE list_sort(list_distinct(list_transform(
                     range(1, len(hs) - {w} + 2), i -> list_min(hs[i:i+{w - 1}]))))
         END AS fps
  FROM h
)
SELECT {id_col}, unnest(fps) AS fp FROM m ORDER BY {id_col}, fp
"""


def render_html_rich(i: int) -> str:
    """Rich deterministic page (~3 KB, Common-Crawl-ish weight): nav/footer
    boilerplate, 40-59 paragraphs, inline style + trailing script. Used by
    the flagship benchmark so extraction cost per row resembles real crawl
    pages rather than fixture stubs."""
    paras = "".join(f"<p>{_sentence(i, k)}</p>" for k in range(40 + i % 20))
    return (
        f"<html><head><title>doc {i}</title><meta charset=\"utf-8\"/>"
        f"<style>p{{margin:0;padding:2px}} nav{{display:flex}}</style></head>"
        f"<body><nav><a href=\"/\">home</a> | <a href=\"/about\">about</a></nav>"
        f"<h1>Document {i}</h1>{paras}"
        f"<footer>terms &amp; privacy {i % 100}</footer>"
        f"<script>var x={i};track(x);</script></body></html>"
    )


def expected_text_rich(i: int) -> str:
    """Independent golden derivation for render_html_rich."""
    paras = " ".join(_sentence(i, k) for k in range(40 + i % 20))
    return f"doc {i} home | about Document {i} {paras} terms & privacy {i % 100}"


# punctuation folds: curly quotes -> straight, en/em dash -> '-', NBSP
# and tab -> space, ellipsis codepoint expanded. Chained replaces, NOT
# `translate`: DuckDB's translate walks BYTES for multi-byte codepoints
# (Postgres heritage), silently corrupting UTF-8 — verified, not assumed.
_NORM_MAP = [
    ("\u2018", "'"), ("\u2019", "'"), ("\u201c", '"'), ("\u201d", '"'),
    ("\u2013", "-"), ("\u2014", "-"), ("\u00a0", " "), ("\t", " "),
    ("\u2026", "..."),
]


def normalize_text_expr(text) -> "Column":
    """\u2606 Pre-tokenization text normalization (the cleanup every web
    pipeline runs between extraction and hygiene): fold curly quotes /
    dashes / NBSP to ASCII, expand the ellipsis codepoint, strip C0
    control characters (newline kept — line structure feeds line_dedup
    and the Gopher line rules), collapse space runs, trim.

    Pure Catalyst: chained codepoint replaces + two ``regexp_replace`` —
    no Python, whole-stage codegen, identical DuckDB twin
    (``normalize_text_sql``)."""
    t = text
    for src, dst in _NORM_MAP:
        t = F.replace(t, F.lit(src), F.lit(dst))
    t = F.regexp_replace(t, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "")
    t = F.regexp_replace(t, "  +", " ")
    return F.trim(t)


def normalize_text_sql(text_expr: str) -> str:
    """DuckDB twin of ``normalize_text_expr`` (identical pass order)."""
    t = text_expr
    for src, dst in _NORM_MAP:
        s, d2 = src.replace("'", "''"), dst.replace("'", "''")
        t = f"replace({t}, '{s}', '{d2}')"
    t = f"regexp_replace({t}, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g')"
    t = f"regexp_replace({t}, '  +', ' ', 'g')"
    return f"trim({t})"
