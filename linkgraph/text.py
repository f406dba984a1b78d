"""Text-analysis operators: document fingerprinting (rolling polynomial
hash) and BPE-ish regex token counting.

All pure built-in column expressions (JVM-side) with exact DuckDB oracles.
Language-ID, quality scoring and whitespace token counting live in
suite.py (q_lang_guess / q_doc_quality / q_doc_token_stats); this module
adds the content-fingerprint and tokenizer-statistics operators of a
training-data pipeline.

Reference parity: fingerprint-dedup generalizes the reference's
preprocessing dedup (/root/reference/datasets/wiki-vote/scripts/process.cpp:83-86)
from exact-row to content-hash identity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import h60, h60_sql, tokens

# Karp-Rabin parameters: base B, modulus M = 2^31 - 1.
# Accumulator < 2^31, token hash < 2^31  =>  acc*B + th < 2^51 + 2^31: no
# int64 overflow in either engine.
KR_BASE = 1_000_003
KR_MOD = (1 << 31) - 1

# BPE-ish tokenizer: letter runs | digit runs | single non-alnum-non-space
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling hash over whitespace tokens (Karp-Rabin)."""
    th = lambda w: h60(w) % KR_MOD  # noqa: E731
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, w: (acc * KR_BASE + th(w)) % KR_MOD,
    )


def fingerprint_sql(text_expr: str) -> str:
    w = f"regexp_split_to_array(trim(lower({text_expr})), '\\s+')"
    hashes = f"list_transform({w}, w -> ({h60_sql('w')}) % {KR_MOD})"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {hashes}), "
        f"(acc, h) -> (acc * {KR_BASE} + h) % {KR_MOD})"
    )


def doc_fingerprints(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fingerprint, keep_id, is_dup) — fingerprint-identity dedup."""
    f = docs.select(F.col(id_col).alias("doc_id"),
                    fingerprint(F.col(text_col)).alias("fingerprint"))
    keep = f.groupBy("fingerprint").agg(F.min("doc_id").alias("keep_id"))
    return f.join(keep, "fingerprint").select(
        "doc_id", "fingerprint", F.col("keep_id").cast("long").alias("keep_id"),
        (F.col("doc_id") != F.col("keep_id")).alias("is_dup"),
    )


def doc_fingerprints_sql(table: str = "documents", text_expr: str = "text",
                         id_expr: str = "doc_id") -> str:
    return f"""
WITH f AS (
  SELECT {id_expr} AS doc_id, {fingerprint_sql(text_expr)} AS fingerprint
  FROM {table}
),
keep AS (SELECT fingerprint, min(doc_id) AS keep_id FROM f GROUP BY fingerprint)
SELECT f.doc_id, f.fingerprint, CAST(k.keep_id AS BIGINT) AS keep_id,
       f.doc_id <> k.keep_id AS is_dup
FROM f JOIN keep k ON f.fingerprint = k.fingerprint
"""


def bpe_token_stats(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bpe, n_alpha, n_num, n_punct) via regex token classes."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)
    cls = lambda pat: F.size(F.filter(toks, lambda t: t.rlike(pat)))  # noqa: E731
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_bpe"),
        cls("^[A-Za-z]+$").cast("long").alias("n_alpha"),
        cls("^[0-9]+$").cast("long").alias("n_num"),
        (F.size(toks) - cls("^[A-Za-z]+$") - cls("^[0-9]+$")).cast("long").alias("n_punct"),
    )


def bpe_token_stats_sql(table: str = "documents", text_expr: str = "text",
                        id_expr: str = "doc_id") -> str:
    toks = f"regexp_extract_all({text_expr}, '{BPE_RE}')"
    return f"""
WITH t AS (SELECT {id_expr} AS doc_id, {toks} AS toks FROM {table})
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_bpe,
       CAST(len(list_filter(toks, x -> regexp_matches(x, '^[A-Za-z]+$'))) AS BIGINT) AS n_alpha,
       CAST(len(list_filter(toks, x -> regexp_matches(x, '^[0-9]+$'))) AS BIGINT) AS n_num,
       CAST(len(toks)
            - len(list_filter(toks, x -> regexp_matches(x, '^[A-Za-z]+$')))
            - len(list_filter(toks, x -> regexp_matches(x, '^[0-9]+$'))) AS BIGINT) AS n_punct
FROM t
"""
