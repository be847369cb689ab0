"""Text-analysis expression library (all JVM-side built-ins).

Training-data-pipeline functions over document text: tokenization,
language-ID heuristic, quality scoring, token counting, shingling,
fingerprinting.  Everything is a Catalyst Column expression — no
Python UDFs — and everything that exposes a hash uses the portable
md5-based hash so DuckDB oracles reproduce it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_seeded,
)

#: tiny English function-word list for the n-gram/stopword language
#: heuristic (public knowledge; order matters for SQL-parity tests)
EN_STOPWORDS = [
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "from", "this", "be", "are",
]

#: BPE-ish lexer: words | numbers | single punctuation
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization (empty string → empty array)."""
    return F.filter(F.split(text, "\\s+"), lambda t: t != "")


def regex_tokens(text: Column) -> Column:
    """BPE-ish regex tokenization."""
    return F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)


def token_counts(text: Column) -> tuple[Column, Column]:
    """(n_ws_tokens, n_regex_tokens)."""
    return F.size(ws_tokens(text)), F.size(regex_tokens(text))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = ws_tokens(F.lower(text))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def lang_id(text: Column, threshold: float = 0.05) -> Column:
    """Stopword-density language heuristic: 'en' vs 'unknown'."""
    return F.when(stopword_ratio(text) >= threshold, F.lit("en")).otherwise(
        F.lit("unknown")
    )


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, "[A-Za-z0-9\\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    toks = ws_tokens(text)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + word-length
    band + low punctuation. Deterministic arithmetic only (SQL-parity)."""
    n_tok = F.size(ws_tokens(text)).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    mwl = mean_word_length(text)
    wl_score = F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    p_score = F.lit(1.0) - F.least(punct_ratio(text) * 4, F.lit(1.0))
    return F.round((len_score + wl_score + p_score) / 3, 6)


def normalized_text(text: Column) -> Column:
    """lowercase + collapse whitespace + trim — the dedup canonical form."""
    return F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 hex of the normalized text."""
    return F.md5(normalized_text(text))


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles of the normalized text (empty if < k words)."""
    toks = ws_tokens(normalized_text(text))
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))


def shingle_hashes(text: Column, k: int = 3) -> Column:
    """Distinct portable-hash values of the k-word shingle set."""
    return F.array_distinct(
        F.transform(word_shingles(text, k), lambda s: portable_hash64(s))
    )


def minhash_signature(text: Column, k: int = 3, num_hashes: int = 8) -> Column:
    """MinHash signature: for seed s, min over shingles of the seeded
    portable hash. array<bigint> of length num_hashes."""
    sh = word_shingles(text, k)

    def seeded(seed: int):
        # single-arg lambda factory: a 2-arg lambda would be bound by
        # pyspark as (element, index) and the seed would silently
        # become the array-index Column
        return lambda s: portable_hash64_seeded(s, seed)

    return F.array(
        *[F.array_min(F.transform(sh, seeded(seed))) for seed in range(num_hashes)]
    )


def simhash16(text: Column) -> Column:
    """16-bit SimHash over whitespace tokens of the normalized text:
    bit b of token-hash votes ±1; sign of the sum sets bit b."""
    toks = ws_tokens(normalized_text(text))
    hashes = F.transform(toks, lambda t: portable_hash64(t))

    def bit_vote(b: int):
        # factory closes over b; F.aggregate's merge lambda must be
        # exactly (acc, x)
        def merge(acc, h):
            return acc + F.when(F.shiftright(h, b) % 2 == 1, 1).otherwise(-1)

        return F.aggregate(hashes, F.lit(0), merge)

    bits = []
    for b in range(16):
        vote = bit_vote(b)
        bits.append(F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def hamming16(a: Column, b: Column) -> Column:
    """Hamming distance between two 16-bit simhashes (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
