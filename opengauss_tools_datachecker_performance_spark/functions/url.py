"""URL canonicalization for web-corpus dedup — built-in column
expressions only (JVM-side, codegen; no Python in the hot path).

Web-crawl curation dedupes by canonical URL before any content pass:
the same page arrives as ``HTTP://WWW.Site.com:80/a/`` and
``http://site.com/a?utm_source=x``.  :func:`canonical_url` applies the
standard normalization steps (RFC 3986 §6 syntax-based normalization
plus the conventional tracking-parameter strip):

* scheme and host lowercased; ``www.`` prefix dropped
* default ports stripped (``:80`` for http, ``:443`` for https)
* tracking query parameters removed (``utm_*``, ``fbclid``,
  ``gclid``, ``ref``); a query left empty drops its ``?``
* fragment dropped; trailing PATH slashes trimmed — including a bare
  root ``/`` — but only when no query survives, so a slash inside a
  query value (``?next=/home/``) is never touched

Every step is a regexp_replace/lower chain, so a DuckDB oracle can
replay it with the same regexes — and the whole expression inlines
into whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tracking params dropped during canonicalization (lowercase names)
TRACKING_PARAMS = ("utm_[a-z]+", "fbclid", "gclid", "ref")

# one alternation, anchored at ? or &: strips "key=value"
_TRACK_RE = "(?:" + "|".join(TRACKING_PARAMS) + ")=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL column (see module docstring).  NULL
    stays NULL; a string with no scheme is left as-is apart from the
    generic steps (the regexes simply don't match)."""
    return _canon_steps(F.trim(url))


def _canon_steps(u: Column) -> Column:
    # lowercase scheme://host[:port] only — the JVM regexp_replace has
    # no callback, so lowercase the extracted prefix and re-attach the
    # case-significant remainder
    head = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    )
    rest = F.substring(u, F.length(head) + F.lit(1), F.lit(1 << 20))
    # when no scheme matched, head='' and rest=u — generic steps still apply
    c = F.concat(head, rest)
    # Every regex below is RE2-safe (no lookaround) so the DuckDB
    # oracle replays the SAME patterns, differing only in replacement
    # syntax ($1 Java vs \1 RE2) and DuckDB's explicit 'g' flag.
    c = F.regexp_replace(c, r"^(https?://)www\.", r"$1")
    c = F.regexp_replace(c, r"^(http://[^/:?#]+):80([/?#].*)?$", r"$1$2")
    c = F.regexp_replace(c, r"^(https://[^/:?#]+):443([/?#].*)?$", r"$1$2")
    c = F.regexp_replace(c, r"#.*$", "")
    # tracking params: joined ones first (&k=v), then a leading one
    # followed by survivors (?k=v& -> ?), then a lone one (?k=v$ -> '')
    c = F.regexp_replace(c, r"&" + _TRACK_RE, "")
    c = F.regexp_replace(c, r"\?" + _TRACK_RE + r"&", "?")
    c = F.regexp_replace(c, r"\?" + _TRACK_RE + r"$", "")
    # trailing PATH slashes — ALL of them, or canonicalization wouldn't
    # be idempotent on '/a//' tails (found by the hypothesis fixed-point
    # property).  The [^?#]-anchored prefix confines the strip to URLs
    # with no surviving query/fragment, so a slash that ends a QUERY
    # VALUE ('?next=/home/') is preserved; a bare authority's root
    # slash is dropped (root stays implicit).
    c = F.regexp_replace(c, r"^([^?#]*[^?#/])/+$", r"$1")
    return F.when(u.isNull(), F.lit(None).cast("string")).otherwise(c)


def url_host(url: Column) -> Column:
    """Lowercased host (no port, no ``www.``) — the domain-level
    grouping key for mixing/blocklist decisions."""
    h = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    h = F.regexp_replace(h, r"^www\.", "")
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)


def url_dedup_groups(
    docs: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """→ (canonical_url, n_docs, keep_id): one row per canonical URL
    with more than one doc — the duplicate groups a crawl dedup pass
    removes, keep = lowest id (deterministic).  One exchange of
    (canonical hash, id) — same shape as exact text dedup."""
    c = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        canonical_url(F.col(url_col)).alias("canonical_url"),
    ).filter(F.col("canonical_url").isNotNull())
    return (
        c.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
        .filter(F.col("n_docs") > 1)
    )
