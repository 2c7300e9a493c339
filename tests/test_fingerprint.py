"""Winnowing fingerprints: the SIGMOD-2003 substring-match guarantee,
degenerate inputs, and copied-passage pair detection."""

from pyspark.sql import functions as F

from crypto_etl_airflow_spark.operators.fingerprint import (
    winnow_fingerprints,
    winnow_profile,
    winnow_shared_pairs,
)

K, W = 8, 4
GUARANTEE = W + K - 1  # any shared run of this many chars → shared fp


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_identical_docs_share_all_fingerprints(spark):
    df = _df(spark, [(1, "the quick brown fox jumps over the lazy dog"),
                     (2, "The  quick  brown fox jumps over the lazy dog")])
    fps = {(r.doc_id, r.fp) for r in winnow_fingerprints(df).collect()}
    a = {fp for d, fp in fps if d == 1}
    b = {fp for d, fp in fps if d == 2}
    assert a and a == b  # normalization makes them identical


def test_copied_passage_guarantees_shared_fingerprint(spark):
    """The winnowing guarantee: a shared character run of length
    ≥ w+k−1 yields at least one shared fingerprint, however
    different the surrounding text."""
    passage = "zygomorphic quartz veins"  # 24 chars ≥ GUARANTEE
    assert len(passage) >= GUARANTEE
    df = _df(spark, [
        (1, f"completely unrelated preamble {passage} and some tail"),
        (2, f"different document body where {passage} appears verbatim"),
        (3, "nothing in common with either of the documents above"),
    ])
    fps = {}
    for r in winnow_fingerprints(df).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2], "copied passage must share a fingerprint"


def test_short_doc_yields_no_fingerprints(spark):
    df = _df(spark, [(1, "tiny"), (2, "x" * (GUARANTEE - 1)), (3, "x" * 64)])
    got = {r.doc_id for r in winnow_fingerprints(df).collect()}
    assert got == {3}


def test_profile_counts_distinct_fps(spark):
    df = _df(spark, [(1, "abcdefgh" * 8)])  # repeated text → few distinct fps
    prof = winnow_profile(df).collect()
    assert len(prof) == 1
    p = prof[0]
    assert p.n_fps >= 1
    assert p.min_fp <= p.max_fp
    n_wins = len("abcdefgh" * 8) - K + 1 - W + 1
    assert p.n_fps < n_wins  # distinct-collapse actually collapsed


def test_shared_pairs_finds_copied_passage_only(spark):
    passage = "an unmistakably copied paragraph of considerable length here"
    df = _df(spark, [
        (1, f"first document original material {passage}"),
        (2, f"{passage} second document with other original material"),
        (3, "a third document with entirely distinct content and words"),
    ])
    pairs = {(r.id_a, r.id_b) for r in
             winnow_shared_pairs(df, min_shared=5).collect()}
    assert pairs == {(1, 2)}


def test_unicode_text_fingerprints_are_cross_engine_stable(spark):
    """Character-indexed substr + md5 must agree with DuckDB on
    multibyte text (umlauts, CJK, emoji, Cyrillic) — both engines
    index characters and hash UTF-8 bytes. Verified exact in round 6;
    pinned here against Spark-side regressions via known-good
    profile values."""
    rows = [
        (1, "die straße führt über die brücke zum großen schloß"),
        (2, "深度学习模型需要大量高质量的训练数据来学习语言规律"),
        (3, "mixed ascii with émojis 🚀🔥 and çédillas everywhere indeed"),
        (4, "русский текст с кириллицей для проверки юникода здесь"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.n_fps, r.min_fp, r.max_fp, r.sum_fp)
        for r in winnow_profile(df).collect()
    )
    assert got == [
        (1, 16, 1614270, 2395163516, 15902243314),
        (2, 6, 512252815, 1856111280, 6629962473),
        (3, 19, 44432194, 1773709975, 16173793017),
        (4, 20, 236099970, 3084544697, 31897161090),
    ]


def test_fuzzy_levenshtein_finds_typo_pair_only(spark):
    from crypto_etl_airflow_spark.operators.fingerprint import (
        fuzzy_pairs_levenshtein,
    )

    base = "the common carrier pigeon navigates by magnetoreception over long distances"
    df = _df(spark, [
        (1, base),
        (2, base.replace("navigates", "navigatez")),   # 1 substitution
        (3, "an entirely different document about oceanic thermal circulation patterns"),
        (4, base + " " + "x" * 20),                     # big length gap
    ])
    got = {(r.id_a, r.id_b): r.edit_distance
           for r in fuzzy_pairs_levenshtein(df, max_dist=5, max_doc_freq=None).collect()}
    assert got == {(1, 2): 1}  # typo pair found; unrelated + length-gap excluded


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[-1]


def test_passjoin_matches_bruteforce_on_adversarial_shorts(spark):
    """Exact recall of the Pass-Join segment blocking vs a no-blocking
    python model, over lengths that break the winnowing block: empty
    strings, below-one-segment tinies, boundary lengths, mutated
    twins."""
    import itertools
    import random
    import re

    from crypto_etl_airflow_spark.operators.fingerprint import passjoin_pairs

    rng = random.Random(7)
    docs = ["", "a", "abc", "ab c", "abcde", "abcdef"]
    for _ in range(40):
        n = rng.randint(0, 30)
        docs.append("".join(rng.choice("ab c") for _ in range(n)))
    for i in range(12):  # twins of earlier docs at distance 1..5
        s = list(docs[i + 6])
        for _ in range(rng.randint(1, 5)):
            if not s:
                break
            op, p = rng.choice("sid"), rng.randrange(len(s))
            if op == "s":
                s[p] = rng.choice("ab c")
            elif op == "i":
                s.insert(p, rng.choice("ab c"))
            else:
                del s[p]
        docs.append("".join(s))

    df = _df(spark, list(enumerate(docs)))
    got = {
        (r.id_a, r.id_b, r.edit_distance)
        for r in passjoin_pairs(df, max_dist=5).collect()
    }
    norm = [re.sub(r"\s+", " ", t.lower()).strip() for t in docs]
    want = {
        (i, j, _lev(norm[i], norm[j]))
        for i, j in itertools.combinations(range(len(docs)), 2)
        if _lev(norm[i], norm[j]) <= 5
    }
    assert got == want


def test_fuzzy_short_fallback_closes_recall_gap(spark):
    """A near-identical pair BELOW the winnowing guarantee (and below
    w+k-1, so zero fingerprints): invisible to the default block,
    found exactly with short_fallback=True."""
    from crypto_etl_airflow_spark.operators.fingerprint import (
        fuzzy_pairs_levenshtein,
    )

    long_a = (
        "the common carrier pigeon navigates by magnetoreception over "
        "long distances and returns home"
    )
    df = _df(spark, [
        (1, "tiny doc"),            # 8 chars — no fingerprints at all
        (2, "tiny dot"),            # distance 1 from doc 1
        (3, long_a),
        (4, long_a.replace("navigates", "navigatez")),
    ])
    base = {
        (r.id_a, r.id_b): r.edit_distance
        for r in fuzzy_pairs_levenshtein(df, max_dist=5, max_doc_freq=None).collect()
    }
    assert (1, 2) not in base and base[(3, 4)] == 1  # the documented gap
    full = {
        (r.id_a, r.id_b): r.edit_distance
        for r in fuzzy_pairs_levenshtein(
            df, max_dist=5, max_doc_freq=None, short_fallback=True
        ).collect()
    }
    assert full == {(1, 2): 1, (3, 4): 1}
