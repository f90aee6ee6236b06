"""Deduplication operators for training-data pipelines (north-star
extensions, SURVEY.md §7.5): exact, n-gram Jaccard, MinHash+LSH, SimHash,
and embedding-cosine near-dup.

Scale design notes (the point of this module):
- Exact dedup is a hash-groupBy — one shuffle on the content hash, partial
  aggregation map-side.
- Exact pairwise Jaccard uses the inverted-index trick (explode shingles,
  self-join on shingle, count co-occurrences) instead of an O(n^2) cross
  join; hot shingles are capped by document frequency so no single key
  explodes the shuffle (the classic skew guard).
- MinHash+LSH banding turns near-dup search into equality joins on band
  keys — each band is a shuffle on a 64-bit key; candidate pairs are then
  verified with true Jaccard. Signatures are computed with ``xxhash64``
  under ``transform``/``array_min`` — all JVM-side, no UDFs.
- SimHash does one explode + groupBy to fold token hashes into a 64-bit
  signature, then pigeonhole-bands 16-bit chunks for Hamming<=k search.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalized, tokens


# ---------------------------------------------------------------- exact ---

def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: keep the smallest id per distinct text.

    Returns (doc_id, dup_count). md5 over the raw text is the group key so
    the shuffle key is 128 bits regardless of document size.
    """
    return (df.groupBy(F.md5(F.col(text_col)).alias("_h"))
              .agg(F.min(id_col).alias(id_col),
                   F.count("*").alias("dup_count"))
              .select(id_col, "dup_count"))


# ------------------------------------------------------------- shingles ---

def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram set of the normalized text (space-joined).

    Documents shorter than n tokens contribute their full token string as
    a single shingle so they still participate.
    """
    t = tokens(normalized(col))
    k = F.size(t) - F.lit(n - 1)
    grams = F.transform(F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
                        lambda i: F.concat_ws(" ", F.slice(t, i, n)))
    return F.array_distinct(grams)


def _pair_jaccard(shingled: DataFrame, max_df: int, id_col: str) -> DataFrame:
    """Inverted-index exact Jaccard over (id, shingles set) rows.

    Emits (doc_a, doc_b, jaccard) for every pair sharing >=1 surviving
    shingle. Shingles in more than ``max_df`` docs are dropped from the
    index (skew guard). Set sizes still use the full set, so the jaccard
    is exact when no shingle shared by a pair was dropped, and a *lower
    bound* otherwise (dropped shingles reduce the counted intersection);
    pass a large ``max_df`` for exact results on small corpora.

    Scale note: only the tiny *hot* shingle set (df > max_df — by
    construction at most corpus_size/max_df rows) is broadcast for a
    left-anti join; the surviving index, which is nearly the whole corpus,
    never moves to the driver.
    """
    sized = shingled.select(F.col(id_col).alias("_id"), F.col("shingles"),
                            F.size("shingles").alias("_m"))
    inv = (sized.select("_id", "_m", F.explode("shingles").alias("_s")))
    # document-frequency cap: drop shingles present in too many docs
    df_counts = inv.groupBy("_s").agg(F.count("*").alias("_df"))
    hot = df_counts.filter(F.col("_df") > max_df).select("_s")
    inv = inv.join(F.broadcast(hot), "_s", "left_anti")
    a = inv.select(F.col("_id").alias("doc_a"), F.col("_m").alias("_ma"), "_s")
    b = inv.select(F.col("_id").alias("doc_b"), F.col("_m").alias("_mb"), "_s")
    inter = (a.join(b, "_s")
              .filter(F.col("doc_a") < F.col("doc_b"))
              .groupBy("doc_a", "doc_b", "_ma", "_mb")
              .agg(F.count("*").alias("_inter")))
    return inter.select(
        "doc_a", "doc_b",
        (F.col("_inter") / (F.col("_ma") + F.col("_mb") - F.col("_inter"))).alias("jaccard"))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.2, max_df: int = 1000) -> DataFrame:
    """N-gram Jaccard near-dup pairs: (doc_a, doc_b, jaccard_r) with
    jaccard >= threshold, rounded to 4 for output. Exact when ``max_df``
    exceeds every shingle's document frequency (see ``_pair_jaccard``);
    otherwise a candidate filter whose jaccard is a lower bound."""
    shingled = df.select(F.col(id_col), word_shingles(F.col(text_col), n).alias("shingles"))
    pairs = _pair_jaccard(shingled, max_df, id_col)
    return (pairs.filter(F.col("jaccard") >= threshold)
                 .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard_r")))


# -------------------------------------------------------------- minhash ---

def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: per seed i, min over shingles of xxhash64(s, i).

    Entirely JVM-side: transform + array_min per permutation; the standard
    (a*x+b mod p) permutation family is replaced by seeded xxhash64, which
    is an equally valid min-wise family in practice.
    """
    return F.array(*[
        F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i))))
        for i in range(num_hashes)
    ])


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      n: int = 3, num_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.2) -> DataFrame:
    """MinHash+LSH near-dup candidates, verified with exact Jaccard.

    bands=16 x rows=4 over 64 hashes -> collision prob ~ s^4 per band;
    candidates are pairs agreeing on >=1 full band. Each band induces one
    equality-join shuffle on (band_idx, band_hash) — the scalable path at
    100 TB where exact all-pairs is impossible. Output is a subset of the
    exact result (candidates only), each verified exactly.
    """
    rows_per_band = num_hashes // bands
    shingled = df.select(F.col(id_col).alias("_id"),
                         word_shingles(F.col(text_col), n).alias("shingles"))
    sig = shingled.withColumn("_sig", minhash_signature(F.col("shingles"), num_hashes))
    band_cols = [
        F.xxhash64(F.concat_ws(",", *[F.element_at("_sig", b * rows_per_band + r + 1)
                                      for r in range(rows_per_band)]), F.lit(b)).alias(f"_band{b}")
        for b in range(bands)
    ]
    banded = sig.select("_id", "shingles", *band_cols)
    # candidate pairs: same hash in any band; union of per-band equality joins
    cand = None
    for b in range(bands):
        l = banded.select(F.col("_id").alias("doc_a"), F.col(f"_band{b}").alias("_bh"))
        r = banded.select(F.col("_id").alias("doc_b"), F.col(f"_band{b}").alias("_bh"))
        p = l.join(r, "_bh").filter(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b")
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.distinct()
    # verify candidates with exact jaccard via the shingle sets
    sa = shingled.select(F.col("_id").alias("doc_a"), F.col("shingles").alias("_sa"))
    sb = shingled.select(F.col("_id").alias("doc_b"), F.col("shingles").alias("_sb"))
    verified = (cand.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("_inter", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn("jaccard", F.col("_inter") /
                    (F.size("_sa") + F.size("_sb") - F.col("_inter"))))
    return (verified.filter(F.col("jaccard") >= threshold)
                    .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard_r")))


# --------------------------------------------------------------- simhash ---

def simhash_64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               out: str = "simhash") -> DataFrame:
    """64-bit SimHash per document from token xxhash64 values.

    One explode + groupBy(doc): per bit b, sum(+1/-1 by bit of token hash);
    signature bit b = (sum > 0). The 64 per-bit sums are 64 conditional
    aggregates in a single aggregation pass (map-side partial agg applies).
    """
    tok = (df.select(F.col(id_col), F.explode(tokens(normalized(F.col(text_col)))).alias("_t"))
             .withColumn("_h", F.xxhash64("_t")))
    bit_sums = [
        F.sum(F.when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"_b{b}")
        for b in range(64)
    ]
    agg = tok.groupBy(id_col).agg(*bit_sums)
    sig = None
    for b in range(64):
        term = F.when(F.col(f"_b{b}") > 0, F.lit(1).cast("long") * (2 ** b if b < 63 else -(2 ** 63))).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return agg.select(F.col(id_col), sig.alias(out))


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= k, found via
    pigeonhole banding: split 64 bits into 4 16-bit chunks; any pair with
    distance <= 3 agrees exactly on >=1 chunk -> equality join per chunk.
    """
    sigs = simhash_64(df, text_col, id_col)

    def band_mask(c: int) -> int:
        # 16-bit band mask as a *signed* 64-bit constant: Python's
        # 0xFFFF << 48 exceeds signed int64, so wrap to two's complement
        # (Column has no << operator; precompute masks driver-side).
        m = 0xFFFF << (16 * c)
        return m - (1 << 64) if m >= (1 << 63) else m

    chunks = [F.col("simhash").bitwiseAND(F.lit(band_mask(c))).alias(f"_c{c}")
              for c in range(4)]
    banded = sigs.select(F.col(id_col).alias("_id"), F.col("simhash"), *chunks)
    cand = None
    for c in range(4):
        l = banded.select(F.col("_id").alias("doc_a"), F.col("simhash").alias("_sa"), F.col(f"_c{c}").alias("_k"))
        r = banded.select(F.col("_id").alias("doc_b"), F.col("simhash").alias("_sb"), F.col(f"_c{c}").alias("_k"))
        p = (l.join(r, "_k").filter(F.col("doc_a") < F.col("doc_b"))
              .select("doc_a", "doc_b", "_sa", "_sb"))
        cand = p if cand is None else cand.unionByName(p)
    dist = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return (cand.distinct()
                .withColumn("hamming", dist)
                .filter(F.col("hamming") <= max_hamming)
                .select("doc_a", "doc_b", "hamming"))


# ---------------------------------------------------- embedding near-dup ---

def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, computed
    JVM-side with zip_with + aggregate (sequential double accumulation —
    deterministic and reproducible by the DuckDB oracle)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    def dot(u, v):
        return F.aggregate(F.zip_with(u, v, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)
    return dot(ad, bd) / (F.sqrt(dot(ad, ad)) * F.sqrt(dot(bd, bd)))


def embedding_near_dup_pairs(df: DataFrame, vec_col: str = "embedding",
                             id_col: str = "vec_id", block_col: str | None = "label",
                             threshold: float = 0.9) -> DataFrame:
    """Embedding near-duplicates: pairs with cosine >= threshold.

    Blocked on ``block_col`` when given (turns the cross join into a
    per-block join — at scale the block key comes from a coarse quantizer
    / LSH bucket, see similarity.lsh_bucket_topk). Exact within blocks.
    """
    a = df.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_va"),
                  *( [F.col(block_col).alias("_blk")] if block_col else [] ))
    b = df.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_vb"),
                  *( [F.col(block_col).alias("_blk")] if block_col else [] ))
    joined = a.join(b, on="_blk" if block_col else None, how="inner") if block_col else a.crossJoin(b)
    pairs = (joined.filter(F.col("vec_a") < F.col("vec_b"))
                   .withColumn("cos", cosine(F.col("_va"), F.col("_vb")))
                   .filter(F.col("cos") >= threshold))
    return pairs.select("vec_a", "vec_b", F.round("cos", 4).alias("cos_r"))
