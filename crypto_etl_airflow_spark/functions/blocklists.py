"""Lexical blocklist filters: URL/domain screening and bad-word
density — the C4/RefinedWeb curation steps that act on literal token
or domain membership rather than statistical quality signals.

- C4 drops any page containing a phrase from the "List of Dirty,
  Naughty, Obscene or Otherwise Bad Words"; RefinedWeb and most
  crawl pipelines additionally screen the page's outbound URLs
  against a domain blocklist (spam/adult/malware feeds).
- Both are pure Column expressions: regex extraction + membership in
  a small literal set compiled into the plan. Zero shuffle, zero
  UDF — at 100 TB these run at parquet-scan speed inside codegen,
  and the blocklists (thousands of entries in production) ship as
  plan literals or a broadcast join when they outgrow literal size
  (the `isin` form is measured fine to ~10⁴ entries; past that,
  broadcast a one-column DataFrame and LEFT ANTI join — same shape
  as operators/lines.py's hot-line set).

The fixture corpora carry no URLs or profanity, so the registered
queries plant both deterministically (the _augment pattern used by
the PII and line-dedup families).

Reference: the crypto-etl-airflow DAG has no text surface
(dags/crypto_etl_dag.py) — this belongs to the mandated LLM-curation
extension.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme + host, capture group 1 = the host
URL_PATTERN = r"https?://([A-Za-z0-9.-]+)"

# demo blocklists — production swaps in real feeds; semantics identical
BLOCKED_DOMAINS = ("spam.example.com", "tracker.example.net")
BAD_WORDS = ("crapcoin", "scamtoken")


def url_domains(text: Column) -> Column:
    """All outbound link hosts in the text, in order of appearance
    (lower-cased; duplicates kept — density matters)."""
    return F.transform(
        F.regexp_extract_all(text, F.lit(URL_PATTERN), 1),
        lambda d: F.lower(d),
    )


def blocked_domain_count(
    text: Column, blocklist: tuple[str, ...] = BLOCKED_DOMAINS
) -> Column:
    return F.size(
        F.filter(url_domains(text), lambda d: d.isin(*blocklist))
    )


def bad_word_count(
    text: Column, words: tuple[str, ...] = BAD_WORDS
) -> Column:
    """Occurrences of blocklisted words among whitespace tokens
    (lower-cased exact-token match — the C4 convention; substring
    matching famously over-fires, e.g. the 'Scunthorpe problem')."""
    toks = F.split(F.lower(text), r"\s+")
    return F.size(F.filter(toks, lambda t: t.isin(*words)))
