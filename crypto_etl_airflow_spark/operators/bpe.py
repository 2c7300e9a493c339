"""BPE merge-rule learning as pure dataflow (tokenizer fitting).

Byte-pair encoding's training loop — count adjacent symbol pairs over
the word vocabulary, merge the most frequent pair, repeat — expressed
entirely as DataFrame operations (Sennrich et al. 2016, the standard
subword-vocabulary algorithm every LLM tokenizer descends from):

- the word vocabulary is one grouped count over the corpus (words
  carry their corpus frequency, so each round aggregates VOCABULARY
  rows, not corpus rows — the classic trick that makes BPE training
  corpus-size-independent after the first pass);
- each round's winning pair is a 1-row DataFrame (deterministic
  tie-break: count desc, then lexicographic) CROSS-JOINED back as a
  broadcast — the merge rule is applied distributively with the rule
  as COLUMNS, no driver-side collect anywhere;
- merge application is an ``F.aggregate`` fold over the symbol list
  (leftmost, non-overlapping — exact BPE semantics), a pure array
  expression the DuckDB oracle mirrors with ``list_reduce``.

Scale posture: round r touches |vocab| rows (millions at 100 TB, not
billions); per-round state is the vocabulary's symbol lists. The
driver loop only BUILDS the plan (n_merges rounds); each round's
symbol table is persisted so round r+1 reads a materialized vocab
instead of recursively re-deriving rounds 0..r (exponential
re-evaluation otherwise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _reuse


def _adjacent_pairs(syms: Column) -> Column:
    """Array of (l, r) structs for each adjacent symbol pair."""
    idx = F.when(
        F.size(syms) >= 2, F.sequence(F.lit(1), F.size(syms) - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(syms, i).alias("l"),
            F.element_at(syms, i + 1).alias("r"),
        ),
    )


def _apply_merge(syms: Column, left: Column, right: Column) -> Column:
    """Fold the merge rule (left, right) → left||right over the
    symbol list, leftmost-first and non-overlapping (a freshly merged
    symbol never re-merges with the following element in the same
    round — exact BPE application order)."""
    tail = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))
    init = F.slice(syms, 1, 1)
    return F.aggregate(
        tail,
        init,
        lambda acc, s: F.when(
            (F.element_at(acc, -1) == left) & (s == right),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(left, right)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the whitespace-lowercased corpus."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _learn_rules(
    df: DataFrame, text_col: str, n_merges: int
) -> list[DataFrame]:
    """The training loop: returns one 1-row DataFrame per learned
    merge — ``(merge_rank, left_sym, right_sym, pair_count)``."""
    cur = _reuse(
        word_vocab(df, text_col).select(
            "word", "freq", F.split("word", "").alias("syms")
        )
    )
    rules: list[DataFrame] = []
    for rank in range(n_merges):
        pairs = cur.select(
            "freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p")
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("l"), F.asc("r"))
            .limit(1)
            .select(
                F.lit(rank).alias("merge_rank"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.col("pair_count").cast("long").alias("pair_count"),
            )
        )
        rules.append(best)
        if rank < n_merges - 1:
            cur = _reuse(_apply_rule(cur, best))
    return rules


def _apply_rule(table: DataFrame, rule_df: DataFrame) -> DataFrame:
    """Apply a (possibly EMPTY) 1-row rule to every ``syms`` row of
    ``table`` via a broadcast LEFT join on a constant key — a plain
    crossJoin would annihilate the table when the corpus exhausts its
    pairs before ``n_merges`` rounds (empty rule × table = empty),
    silently dropping every row. With the left join an absent rule
    leaves the symbols unchanged."""
    rule = F.broadcast(
        rule_df.select(
            F.lit(1).alias("__k"),
            F.col("left_sym").alias("__l"),
            F.col("right_sym").alias("__r"),
        )
    )
    keep = [c for c in table.columns if c != "syms"]
    return (
        table.withColumn("__k", F.lit(1))
        .join(rule, "__k", "left")
        .select(
            *keep,
            F.when(F.col("__l").isNull(), F.col("syms"))
            .otherwise(
                _apply_merge(F.col("syms"), F.col("__l"), F.col("__r"))
            )
            .alias("syms"),
        )
    )


def bpe_merge_rules(
    df: DataFrame, text_col: str = "text", n_merges: int = 4
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules from the corpus:
    ``(merge_rank, left_sym, right_sym, pair_count)`` — one row per
    learned merge, in learning order."""
    rules = _learn_rules(df, text_col, n_merges)
    out = rules[0]
    for extra in rules[1:]:
        out = out.unionByName(extra)
    return out


def bpe_token_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 4,
) -> DataFrame:
    """Tokenize every document with the corpus-learned merge rules
    and report per-document token statistics:

    ``(id_col, n_words, n_chars, n_bpe_tokens, compression)``

    where ``compression = n_chars / n_bpe_tokens`` (chars per BPE
    token — the number a tokenizer-budget estimate needs). The
    tokenization pass is linear: explode to words, apply each learned
    rule as a broadcast 1-row cross join + array fold (no driver
    collect), one grouped count at the end."""
    rules = _learn_rules(df, text_col, n_merges)
    words = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"),
        )
        .filter(F.col("word") != "")
        .select(id_col, "word", F.split("word", "").alias("syms"))
    )
    for rule_df in rules:
        # left-join application: an empty rule (pairs exhausted before
        # n_merges) must leave documents untouched, not drop them
        words = _apply_rule(words, rule_df)
    return words.groupBy(id_col).agg(
        F.count("*").alias("n_words"),
        F.sum(F.length("word")).cast("long").alias("n_chars"),
        F.sum(F.size("syms")).cast("long").alias("n_bpe_tokens"),
        F.round(
            F.sum(F.length("word")) / F.sum(F.size("syms")), 6
        ).alias("compression"),
    )
