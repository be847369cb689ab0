"""Composite document-quality filter — the Gopher rule table
(Rae et al. 2021 §A1.1) as one operator.

Upstream, each quality signal is its own measurement operator
(functions.text: repetition_stats, pii_scan, stopword_ratio); this is
the POLICY layer a pipeline actually applies: evaluate every rule,
emit one verdict row per doc with the sorted list of violated rules,
keep = no rule fired. Emitting reasons (not just a boolean) is what
makes a 100 TB filter run auditable — the report can aggregate drops
per rule and a threshold regression shows up as a reason-mix shift,
not a silent corpus shrink.

Plan shape: repetition_stats' one corpus exchange (its per-doc bigram
window) plus ONE map-only projection for the other signals (PII
regexp counts + stopword density share the text decode), joined on
doc_id. Reasons/keep are pure collection expressions — no UDFs, no
extra shuffle beyond the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.functions.text import (
    EN_STOPWORDS,
    PII_PATTERNS,
    normalized_text,
    repetition_stats,
    ws_tokens,
)


def quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 50_000,
    max_dup_token_frac: float = 0.30,
    max_top_bigram_frac: float = 0.20,
    min_stopword_ratio: float = 0.05,
    flag_pii: bool = True,
) -> DataFrame:
    """→ (doc_id, n_tokens, keep, reasons): per-doc keep/drop verdict
    with ``reasons`` = the sorted array of violated rule names
    (empty ⇔ keep). Rules (all thresholds parameters):

    * ``too_short`` / ``too_long`` — token-count envelope;
    * ``repetition`` — duplicate-token fraction above threshold;
    * ``boilerplate`` — single most-frequent bigram covers too much;
    * ``non_english`` — stopword density below threshold (the cheap
      lang-ID heuristic; swap for lang_id_profile where multi-language
      corpora need real routing);
    * ``pii`` — any PII-shaped substring (email/IPv4/phone).

    Stopword density uses the SAME normalized tokenization as every
    other text operator (lowercase + whitespace-collapse), so the
    measurements compose — and the DuckDB oracle reproduces them
    token-for-token."""
    rep = repetition_stats(df, id_col, text_col)
    t = F.col(text_col)
    toks = ws_tokens(normalized_text(t))
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    sw_ratio = F.when(
        n > 0, hits.cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))
    any_pii = None
    for p in PII_PATTERNS.values():
        c = F.regexp_count(t, F.lit(p)) > 0
        any_pii = c if any_pii is None else (any_pii | c)
    signals = df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        sw_ratio.alias("_sw"),
        any_pii.alias("_pii"),
    )
    rules = [
        (F.col("n_tokens") < min_tokens, "too_short"),
        (F.col("n_tokens") > max_tokens, "too_long"),
        (F.col("dup_token_frac") > max_dup_token_frac, "repetition"),
        (F.col("top_bigram_frac") > max_top_bigram_frac, "boilerplate"),
        (F.col("_sw") < min_stopword_ratio, "non_english"),
    ]
    if flag_pii:
        rules.append((F.col("_pii"), "pii"))
    reasons = F.array_sort(
        F.filter(
            F.array(*[F.when(cond, F.lit(name)) for cond, name in rules]),
            lambda x: x.isNotNull(),
        )
    )
    return rep.join(signals, "doc_id").select(
        "doc_id",
        "n_tokens",
        (F.size(reasons) == 0).alias("keep"),
        reasons.alias("reasons"),
    )
