"""Text-analysis column expressions (all JVM-side built-ins, no UDFs).

Each helper has a Spark form and a DuckDB form producing identical values, so
the text/dedup operators are oracle-checkable.  Tokenization is single-space
splitting with empty tokens dropped (the documents corpus is space-joined
words; both engines split identically).
"""

from __future__ import annotations

STOPWORDS = ("the", "and", "of", "a", "to", "in")

# BPE-ish tokenizer regex: letter runs, digit runs, single non-alnum marks.
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def tokens_spark(col: str) -> str:
    return f"filter(split({col}, ' '), x -> x != '')"


def tokens_duckdb(col: str) -> str:
    return f"list_filter(string_split({col}, ' '), x -> x != '')"


def shingles_spark(toks: str, n: int) -> str:
    """Distinct n-word shingles; empty array when the doc is shorter than n
    (guarded: Spark's sequence(1, m) runs DESCENDING when m < 1)."""
    gen = (
        f"transform(sequence(1, size({toks}) - {n} + 1),"
        f" i -> concat_ws(' ', slice({toks}, i, {n})))"
    )
    return (
        f"case when size({toks}) >= {n} then array_distinct({gen})"
        f" else cast(array() as array<string>) end"
    )


def shingles_duckdb(toks: str, n: int) -> str:
    parts = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(n))
    return (
        f"list_distinct(list_transform(range(1, len({toks}) - {n} + 2),"
        f" i -> {parts.replace('i + 0', 'i')}))"
    )


def stopword_count_spark(toks: str) -> str:
    arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"size(filter({toks}, x -> array_contains(array({arr}), x)))"


def stopword_count_duckdb(toks: str) -> str:
    arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"len(list_filter({toks}, x -> list_contains([{arr}], x)))"
