"""Text-analysis columns for large-scale corpus pipelines — all JVM
higher-order expressions (split / filter / aggregate), no Python in
the data path, so they stay inside whole-stage codegen and scale
linearly with the corpus.

These are the per-document feature primitives a 100 TB training-data
pipeline computes in its first pass (token stats, quality score,
language ID, content fingerprint).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword set shared with the oracle SQL.
STOPWORDS = ("a", "the")
FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def tokens(col: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(col, " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def regex_token_count(col: Column, pattern: str = "[a-z]+") -> Column:
    """BPE-ish regex token count (subword-alphabetic runs)."""
    return F.regexp_count(col, F.lit(pattern))


def stopword_count(col: Column) -> Column:
    toks = tokens(col)
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def stopword_ratio(col: Column) -> Column:
    return stopword_count(col).cast("double") / token_count(col).cast("double")


def avg_token_len(col: Column) -> Column:
    """Mean token length: (chars − separators) / tokens."""
    n = token_count(col)
    return (F.length(col) - (n - F.lit(1))).cast("double") / n.cast("double")


def quality_score(col: Column) -> Column:
    """Deterministic quality heuristic ∈ [0, 1]: reward length up to
    400 tokens, penalize stopword-heavy text."""
    n = token_count(col).cast("double")
    return F.least(F.lit(1.0), n / F.lit(400.0)) * (F.lit(1.0) - stopword_ratio(col))


def lang_id(col: Column, threshold: float = 0.03) -> Column:
    """Stopword-density language heuristic: English function words
    above ``threshold`` of tokens → 'en', else 'unk'. (The synthetic
    corpus is language-agnostic word soup; the operator contract is
    the deterministic heuristic itself.)"""
    return F.when(stopword_ratio(col) > threshold, "en").otherwise("unk")


# PII patterns kept to the Java-regex ∩ RE2 common dialect so the
# exact same strings run in Spark and the DuckDB oracle.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{4}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_count(col: Column, pattern: str) -> Column:
    return F.regexp_count(col, F.lit(pattern))


def redact_pii(col: Column) -> Column:
    """Replace emails → <EMAIL>, then phones → <PHONE>, then IPv4 →
    <IP> (email first: its local part can contain digits a phone
    pattern would chew on). Pure JVM regexp_replace — codegen'd,
    linear scan, no UDF."""
    out = F.regexp_replace(col, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE, "<PHONE>")
    return F.regexp_replace(out, PII_IPV4, "<IP>")


def fingerprint(col: Column) -> Column:
    """Karp–Rabin rolling hash over the character stream:
    fold(acc → acc·31 + ascii(c) mod 1e9+7). A single JVM ``aggregate``
    per row — no shuffle, no UDF."""
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * FINGERPRINT_BASE + F.ascii(c)) % FINGERPRINT_MOD,
    )
