"""Shared regex patterns + DuckDB SQL snippets for the corpus operators.

Every corpus operator (dedup, similarity, text analysis) is defined
twice — once as a PySpark DataFrame builder (operators/*.py) and once
as ANSI-ish SQL for the DuckDB oracle (__spark_entry__.oracle_sql).
The patterns and constants here are the single source of truth both
sides read, so the two definitions cannot drift silently.

Determinism-across-engines rules used throughout:
- hashes are md5 hex strings (lowercase in both engines); minima are
  lexicographic string minima — no integer hash conversions;
- float outputs are avoided or pre-rounded and cast to BIGINT;
- ties are always broken by an id column.
"""

# Word tokens: lowercase alnum runs (ASCII); empties filtered.
WORD_SPLIT_PATTERN = "[^a-z0-9]+"

# Whitespace tokenization.
WS_SPLIT_PATTERN = r"\s+"

# BPE-ish token pattern: letter runs | digit runs | single other symbol.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Simple punctuation class for quality scoring.
PUNCT_CLASS = "[.,;:!?]"

# Thai codepoint block (language-ID heuristic).
THAI_NEGATED_CLASS = "[^฀-๿]"

# Stopwords for the quality score (tiny, frozen list).
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# MinHash configuration: 8 permutations -> 2 bands of 4 rows.
MINHASH_PERMS = 8
MINHASH_BANDS = 2
SHINGLE_WORDS = 3

# SimHash: 16 bits from md5 hex-digit parity votes.
SIMHASH_BITS = 16
SIMHASH_HEX_HIGH = "89abcdef"  # hex digits whose top bit is 1

# Character shingle width for document fingerprinting.
FINGERPRINT_NGRAM = 8

# ANN configuration.
ANN_QUERY_EVERY = 100  # vec_id % EVERY == 0 are the query vectors
ANN_TOP_K = 5


def duck_word_tokens(col: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({col}), '{WORD_SPLIT_PATTERN}'), "
        "x -> x <> '')"
    )


def duck_shingles(tokens: str) -> str:
    """3-word shingles; DuckDB lists are 1-based."""
    k = SHINGLE_WORDS
    parts = " || ' ' || ".join(f"{tokens}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({tokens}) >= {k} THEN "
        f"list_transform(generate_series(1, len({tokens}) - {k - 1}), i -> {parts}) "
        "ELSE [] END"
    )


def duck_minhash_sig(shingles: str, perm: int) -> str:
    return f"list_min(list_transform({shingles}, x -> md5(x || '#{perm}')))"
