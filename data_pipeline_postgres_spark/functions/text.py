"""Text-analysis column builders (SURVEY.md §2.11 [EXT]).

Every builder returns a JVM-side Column expression (split / transform /
md5 / regexp — all whole-stage-codegen friendly), never a Python UDF.
Hashes are lowercase-hex md5 strings compared lexicographically, so a
DuckDB oracle computes bit-identical values.

Designed for 100 TB: all per-document, embarrassingly parallel — no
shuffle is introduced by any builder here; downstream operators decide
the shuffle strategy (dedup.py, similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenizer — identical semantics to DuckDB's
# regexp_split_to_array(trim(text), '\s+').
TOKEN_PATTERN = r"\s+"

# BPE-ish subword pattern: runs of letters, runs of digits, or a single
# non-alphanumeric glyph (a crude GPT-2-style pre-tokenizer).
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

STOPWORDS = ("the", "a", "and", "of", "to", "in")


def tokens(col: str = "text") -> Column:
    """Whitespace tokens of a trimmed text column."""
    return F.split(F.trim(F.col(col)), TOKEN_PATTERN)


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles: array of space-joined n-token windows.

    Shape matters for speed: ``arrays_zip`` of n shifted ``slice``\\ s
    evaluates the token array once per ROW, then a transform walks the
    zipped structs. (The naive form — ``element_at(toks, i+j)`` inside
    the lambda — re-evaluates the upstream tokenizer expression per
    ELEMENT, which made shingling ~10× slower than the rest of the
    MinHash pipeline combined.) Empty array when the document has
    fewer than ``n`` tokens.
    """
    cnt = F.size(toks) - (n - 1)
    z = F.arrays_zip(*[F.slice(toks, i + 1, cnt) for i in range(n)])
    sh = F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )
    return F.when(F.size(toks) >= n, sh).otherwise(
        F.array().cast("array<string>")
    )


def ws_token_count(col: str = "text") -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_token_count(col: str = "text") -> Column:
    """BPE-ish subword token count via regexp matching."""
    return F.regexp_count(F.lower(F.col(col)), F.lit(BPE_PATTERN))


def stopword_count(toks: Column) -> Column:
    """Number of tokens that are stopwords."""
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def punct_count(col: str = "text") -> Column:
    """Number of non-alphanumeric, non-space characters."""
    return F.regexp_count(F.lower(F.col(col)), F.lit(r"[^a-z0-9\s]"))
