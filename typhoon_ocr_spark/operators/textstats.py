"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting — the per-document scoring stages of
a training-data pipeline, all pure column expressions (JVM-side,
whole-stage-codegen; zero Python in the hot path).

Cross-engine determinism: ratios are emitted as rounded per-mille
BIGINTs, hashes as md5 hex strings (see functions/textsql.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textsql import (
    BPE_TOKEN_PATTERN,
    FINGERPRINT_NGRAM,
    PUNCT_CLASS,
    STOPWORDS,
    THAI_NEGATED_CLASS,
    WS_SPLIT_PATTERN,
)
from .dedup import word_tokens


def _per_mille(num: Column, den: Column) -> Column:
    return F.round(F.lit(1000.0) * num / F.greatest(den, F.lit(1))).cast("long")


def language_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram-free language ID heuristic: Thai-codepoint density.
    Output: (doc_id, thai_per_mille, pred_lang)."""
    n = F.length(F.col(text_col))
    thai = F.length(F.regexp_replace(F.col(text_col), THAI_NEGATED_CLASS, ""))
    per_mille = _per_mille(thai, n)
    return documents.select(
        "doc_id",
        per_mille.alias("thai_per_mille"),
        F.when(per_mille >= 100, F.lit("th")).otherwise(F.lit("en")).alias("pred_lang"),
    )


def quality_scores(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality gate: length / punctuation / digit / stopword ratios.
    Output: (doc_id, n_chars, n_tokens, punct_per_mille,
    digit_per_mille, stop_per_mille, keep)."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = word_tokens(text)
    n_tokens = F.size(toks).cast("long")
    punct = F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    digits = F.length(text) - F.length(F.regexp_replace(text, "[0-9]", ""))
    stops = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("long")
    punct_pm = _per_mille(punct, n_chars)
    digit_pm = _per_mille(digits, n_chars)
    stop_pm = _per_mille(stops, n_tokens)
    return documents.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        punct_pm.alias("punct_per_mille"),
        digit_pm.alias("digit_per_mille"),
        stop_pm.alias("stop_per_mille"),
        (
            (n_tokens >= 5)
            & (punct_pm <= 300)
            & (digit_pm <= 500)
        ).alias("keep"),
    )


def token_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    (letter runs | digit runs | single symbols).
    Output: (doc_id, ws_tokens, bpe_tokens)."""
    text = F.col(text_col)
    ws = F.size(
        F.filter(F.split(text, WS_SPLIT_PATTERN), lambda x: x != F.lit(""))
    ).cast("long")
    bpe = F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0)).cast("long")
    return documents.select("doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))


def fingerprints(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: lexicographic-min md5 over rolling
    character 8-grams of the lowercased text (a winnowing-style content
    fingerprint robust to reordering of large blocks).
    Output: (doc_id, fingerprint, n_grams)."""
    k = FINGERPRINT_NGRAM
    # Two Generate-node barriers (explode(array(x))): (1) lower(text)
    # evaluates once per row instead of once per GRAM inside the
    # substr lambda (O(len²) otherwise), (2) the gram array
    # materializes once for its two consumers (min + size).
    lowered = documents.select(
        "doc_id", F.explode(F.array(F.lower(F.col(text_col)))).alias("lt")
    )
    lt = F.col("lt")
    grams = F.when(
        F.length(lt) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(lt) - (k - 1)),
            lambda i: F.md5(lt.substr(i, F.lit(k))),
        ),
    ).otherwise(F.array(F.md5(lt)))
    gram_rows = lowered.select("doc_id", F.explode(F.array(grams)).alias("grams"))
    return gram_rows.select(
        "doc_id",
        F.array_min("grams").alias("fingerprint"),
        F.size("grams").cast("long").alias("n_grams"),
    )
