"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The dedup family a 100 TB training-data pipeline needs (BASELINE.json
``north_star``; SURVEY.md §7.5). All four are DataFrame compositions —
no Python row loops:

- **exact**: fingerprint (md5 of normalized text) → hash groupBy.
  One shuffle on the fingerprint.
- **n-gram Jaccard**: word shingles → explode → self-join on shingle
  → count intersections → Jaccard from set sizes. Exact pairwise
  similarity restricted to documents that share ≥1 shingle (never a
  full cross-product). Shuffles on the shingle, then on the pair.
- **MinHash + LSH**: k deterministic hash functions over shingle
  hashes → signature → band → bucket-join. Candidate generation is
  linear-ish: only same-bucket docs pair up. The standard scale path
  when pairwise-with-shared-shingle is still too big (common shingles
  create hot keys; banding bounds it).
- **SimHash**: 64-bit weighted bit-vote fingerprint; near-dup pairs
  have small Hamming distance. Band the 64 bits into 4×16-bit keys:
  any pair within Hamming ≤ 3 shares at least one exact band (pigeon-
  hole), so candidate generation is 4 equi-joins, verified by
  bit_count(xor).

Hash functions are Spark's built-in xxhash64 (JVM, codegen'd); the
MinHash family is ``(a_i * h + b_i) mod p`` with constants derived
deterministically from the permutation index — reproducible across
runs and clusters, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 31-bit Mersenne prime: (a*h + b) with a,h,b < 2^31 stays well inside
# int64, so the modular hash needs no 128-bit arithmetic (Spark 4 runs
# ANSI mode and throws on long overflow)
MERSENNE_P = (1 << 31) - 1


def normalized_text(text_col: str = "text") -> F.Column:
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Built with sequence+transform+slice — pure array expressions, no
    UDF. Documents shorter than n words produce no shingles.
    """
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    # guard: sequence(1, 0) would generate a DESCENDING [1, 0] in Spark,
    # so short documents must map to an empty index array instead
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )
    return (
        df.select(F.col(id_col), F.explode(shingles).alias("shingle"))
        .distinct()
    )


def _hashed_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, xxhash64(shingle)) — the narrow-key form every pairwise
    stage joins and aggregates on."""
    return word_shingles(df, id_col, text_col, n).select(
        F.col(id_col), F.xxhash64("shingle").alias("sh")
    )


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact dedup via normalized-text fingerprint: every row keeps
    its group's min id; ``is_duplicate`` marks non-canonical rows."""
    from ..functions.text import fingerprint

    with_fp = df.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint")
    )
    groups = with_fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("group_size")
    )
    return (
        with_fp.join(groups, "fingerprint")
        .select(
            id_col,
            "fingerprint",
            "keep_id",
            "group_size",
            (F.col(id_col) != F.col("keep_id")).alias("is_duplicate"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard similarity over word n-gram shingle SETS for all
    pairs sharing at least one shingle; keeps pairs ≥ threshold.

    Returns (id_a, id_b, jaccard) with id_a < id_b. At scale the
    shingle self-join is the hot spot: frequent shingles fan out
    quadratically — cap them (stop-shingle removal) or switch to
    minhash_lsh_candidates below.

    The join key is the shingle's xxhash64, not the string: the
    shuffle moves 8-byte longs instead of n-word strings. A 64-bit
    collision would merge two shingles (P ≈ k²/2⁶⁵ for k distinct
    shingles — negligible below ~10⁸ shingles per corpus).
    """
    sh = _hashed_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))

    a = sh.select(F.col(id_col).alias("id_a"), "sh")
    b = sh.select(F.col(id_col).alias("id_b"), "sh")
    common = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signature per document: for permutation i, the minimum
    of ``(a_i * xxhash64(shingle) + b_i) mod p`` over the doc's
    shingles. Constants a_i, b_i derive from xxhash64(i) — fixed,
    reproducible, no RNG.

    One aggregation: groupBy(doc) of min over each of the k hash
    expressions (map-side partial min makes this cheap).
    """
    sh = word_shingles(df, id_col, text_col, n)
    h = (F.xxhash64("shingle") % MERSENNE_P + MERSENNE_P) % MERSENNE_P

    mins = []
    for i in range(num_hashes):
        a = (F.xxhash64(F.lit(f"minhash-a-{i}")) % (MERSENNE_P - 1) + (MERSENNE_P - 1)) % (
            MERSENNE_P - 1
        ) + 1  # a in [1, p-1]
        b = (F.xxhash64(F.lit(f"minhash-b-{i}")) % MERSENNE_P + MERSENNE_P) % MERSENNE_P
        mins.append(F.min((a * h + b) % MERSENNE_P).alias(f"mh_{i}"))
    return sh.groupBy(id_col).agg(*mins)


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of
    ``num_hashes // bands`` rows, hash each band, and pair documents
    sharing any (band_idx, band_hash) bucket. Returns distinct
    (id_a, id_b) candidates, id_a < id_b.

    The band-bucket join is the scale trick: candidates ∝ collisions,
    never n². Probability a pair with Jaccard j collides:
    1 - (1 - j^r)^b with r = rows per band.
    """
    r = num_hashes // bands
    band_rows = []
    for bi in range(bands):
        cols = [F.col(f"mh_{bi * r + j}") for j in range(r)]
        band_rows.append(
            signatures.select(
                F.col(id_col),
                F.lit(bi).alias("band"),
                F.xxhash64(*cols).alias("bucket"),
            )
        )
    buckets = band_rows[0]
    for extra in band_rows[1:]:
        buckets = buckets.unionAll(extra)

    left = buckets.select(F.col(id_col).alias("id_a"), "band", "bucket")
    right = buckets.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded
    candidates → EXACT Jaccard verification of candidates only.

    Output matches :func:`ngram_jaccard_pairs` up to LSH recall (a
    near-dup pair is missed only if it collides in no band)."""
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    cands = minhash_lsh_candidates(sigs, id_col, num_hashes, bands)

    sh = _hashed_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col(id_col).alias("id_a"), "sh")
    b = sh.select(F.col(id_col).alias("id_b"), "sh")
    common = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .join(cands, ["id_a", "id_b"], "left_semi")  # verify candidates only
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document: each token votes its xxhash64
    bits weighted by term frequency; the sign of each bit's vote sum
    becomes the fingerprint bit.

    Expressed as explode → per-bit conditional sums → bit OR-fold:
    one shuffle on the doc id. Returns (id, simhash BIGINT).
    """
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    )
    h = F.xxhash64("token")
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{i}")
        for i in range(64)
    ]
    per_doc = tok.groupBy(id_col).agg(*votes)
    sim = F.lit(0).cast("long")
    for i in range(64):
        # shiftleft wraps bit 63 into the long sign bit (two's complement)
        bit_i = F.shiftleft(F.lit(1).cast("long"), i)
        sim = sim.bitwiseOR(
            F.when(F.col(f"v_{i}") > 0, bit_i).otherwise(F.lit(0).cast("long"))
        )
    return per_doc.select(F.col(id_col), sim.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance ≤ max_hamming.

    Candidates via 4×16-bit band equality (pigeonhole guarantees
    recall for distance ≤ 3), verified with bit_count(a XOR b).
    Returns (id_a, id_b, hamming).
    """
    sims = simhash64(df, id_col, text_col)

    bands = []
    for bi in range(4):
        bands.append(
            sims.select(
                F.col(id_col),
                F.col("simhash"),
                F.lit(bi).alias("band"),
                F.shiftrightunsigned("simhash", bi * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("bucket"),
            )
        )
    all_bands = bands[0]
    for extra in bands[1:]:
        all_bands = all_bands.unionAll(extra)

    left = all_bands.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"), "band", "bucket"
    )
    right = all_bands.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"), "band", "bucket"
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
