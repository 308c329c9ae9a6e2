"""Deduplication operators — exact and near-duplicate.

The reference's only dedup is keep-last-per-key dict building
(reference update_ticker_info.py:136, scrape_tickers.py:601-602);
the near-dup family (MinHash-LSH, SimHash, n-gram Jaccard) is the
north-star extension for training-data pipelines at 100 TB.

Design for scale:
  * content hashing (md5) happens scan-side — codegen, no Python;
  * MinHash avoids the all-pairs O(n²) comparison: signatures are
    banded, candidate pairs come from an equi-join on
    (band, band_signature) — shuffle volume ∝ #near-dup candidates,
    not n²;
  * SimHash joins on 16-bit prefix blocks (two out of four blocks
    must match for Hamming ≤ 3-per-block patterns; we use prefix
    blocking as the candidate generator) — again equi-join, not
    cross join;
  * n-gram Jaccard verifies candidates exactly via exploded-shingle
    intersection counts (group-by, map-side combinable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from psx_data_pipeline_spark.functions.hashing import (
    HASH_P,
    md5_long,
    minhash_perms,
)
from psx_data_pipeline_spark.functions.textfns import tokens, word_shingles


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact content dedup: md5 fingerprint group-by, keep min id.

    Returns (id, fingerprint, group_size) for the survivor of each
    content group. One shuffle on the 128-bit fingerprint — at scale
    the canonical first pass before any near-dup method.
    """
    fp = F.md5(F.col(text_col)).alias("fingerprint")
    return (
        df.select(F.col(id_col).alias("id"), fp)
        .groupBy("fingerprint")
        .agg(F.min("id").alias("id"), F.count(F.lit(1)).alias("group_size"))
        .select("id", "fingerprint", "group_size")
    )


def dedup_latest(df: DataFrame, key: str, order_col: str, tiebreak: str) -> DataFrame:
    """Keep-last-per-key (reference dict-build semantics,
    update_ticker_info.py:136) via row_number over
    (order_col desc, tiebreak desc) — the explicit secondary key makes
    the pick deterministic when two rows of a key share order_col."""
    w = Window.partitionBy(key).orderBy(F.desc(order_col), F.desc(tiebreak))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# --- MinHash + LSH ----------------------------------------------------------

def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, k: int = 16, shingle_n: int = 3
) -> DataFrame:
    """Per-document MinHash signature as (id, i, minv) rows.

    Shingle hashing is an array expression (no explode); the k
    permutations are a broadcast-joined constants table; min per
    (doc, perm) is a map-side-combinable aggregate.
    """
    perms = df.sparkSession.createDataFrame(
        minhash_perms(k), "i INT, a LONG, b LONG"
    )
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(text_col, shingle_n))).alias("sh"),
    ).withColumn("h", md5_long(F.col("sh")) % HASH_P)
    return (
        sh.join(F.broadcast(perms))
        .groupBy("id", "i")
        .agg(F.min((F.col("a") * F.col("h") + F.col("b")) % HASH_P).alias("minv"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) whose signatures collide
    in ≥1 LSH band. rows_per_band = k/bands; band signature is the
    ordered concatenation of the band's min-values."""
    rows_per_band = k // bands
    sig = minhash_signatures(df, text_col, id_col, k, shingle_n).withColumn(
        "band", (F.col("i") / rows_per_band).cast("int")
    )
    band_sig = sig.groupBy("id", "band").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "minv"))),
                lambda s: s["minv"].cast("string"),
            ),
        ).alias("bsig")
    )
    a = band_sig.select(
        F.col("id").alias("id_a"), "band", "bsig"
    )
    b = band_sig.select(F.col("id").alias("id_b"), "band", "bsig")
    return (
        a.join(b, ["band", "bsig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# --- SimHash ----------------------------------------------------------------

def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """Per-document SimHash over token md5 hashes.

    Token explode → per-bit signed vote → majority bit → integer
    fingerprint. Shuffles once on the doc id (map-side combine on the
    per-bit sums). ``bits`` ≤ 60 so everything stays in one bigint.
    """
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("tok"),
    ).withColumn("h", md5_long(F.col("tok")))
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j")
    # PySpark's F.shiftright/F.shiftleft demand a Python-int shift, but
    # the SQL functions take any expression — go through F.expr.
    votes = tok.select("id", "h", bit).withColumn(
        "sign",
        F.when(F.expr("shiftright(h, j) & 1") == 1, 1).otherwise(-1),
    )
    return (
        votes.groupBy("id", "j")
        .agg(F.sum("sign").alias("s"))
        .withColumn("bitval", F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)))
        .groupBy("id")
        .agg(
            F.sum(F.expr("CAST(bitval AS BIGINT) * shiftleft(CAST(1 AS BIGINT), j)"))
            .alias("simhash")
        )
    )


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, bits: int = 32, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    Candidate generation blocks on ⌈bits/16⌉ prefix blocks (pigeonhole:
    Hamming ≤ max_hamming ⇒ at least one 16-bit block equal when
    blocks > max_hamming); verification is bit_count(xor) ≤ d.
    """
    n_blocks = max(max_hamming + 1, bits // 16)
    block_w = bits // n_blocks
    sh = simhash(df, text_col, id_col, bits)
    blk = sh.select(
        "id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("blk"),
    ).withColumn(
        "blkval",
        F.expr(
            f"shiftright(simhash, blk * {block_w})"
            f" % shiftleft(CAST(1 AS BIGINT), {block_w})"
        ),
    )
    a = blk.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "blk", "blkval")
    b = blk.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "blk", "blkval")
    return (
        a.join(b, ["blk", "blkval"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --- n-gram Jaccard -----------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard similarity over distinct n-word shingles for all
    pairs sharing ≥1 shingle.

    |A∩B| comes from the exploded-shingle self-equi-join (never a
    cross join); the shingle rows carry their doc's distinct-set size
    so |A∪B| = |A|+|B|-|A∩B| falls out of the same aggregation — no
    second join and, critically, no broadcast of a per-document table
    (one row per doc broadcast-OOMs at billions of docs).
    Output: (id_a, id_b, jaccard) above threshold. Jaccard is a ratio
    of integers → identical across engines.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(text_col, shingle_n)).alias("shs"),
    ).withColumn("n_sh", F.size("shs"))
    sh = base.select("id", "n_sh", F.explode("shs").alias("sh"))
    a = sh.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "sh")
    b = sh.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "sh")
    return (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_int"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_int").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_int")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
