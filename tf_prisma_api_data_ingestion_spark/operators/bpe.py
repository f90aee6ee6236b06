"""BPE tokenizer TRAINING as a Spark driver loop (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
missing trainer behind ``text.bpe_ish_piece_count``'s inference-side
proxy (north-star extension; the reference has no tokenizer at all).

One merge iteration is two corpus-independent, vocab-sized steps:

1. PAIR COUNT: explode each vocab word's adjacent symbol pairs, sum
   word frequencies per pair (one map-side-combinable shuffle on the
   pair key).
2. ELECT + APPLY: argmax pair with a pinned total tie-break
   (count DESC, left ASC, right ASC — binary string order in both
   engines), broadcast the 1-row winner, and apply it to every word
   with a greedy LEFT-TO-RIGHT NON-OVERLAPPING merge implemented as a
   single higher-order ``aggregate`` fold — pure map-side, no UDF.

The corpus-sized work happens ONCE (the word-count groupBy building the
initial vocab); every training round after that touches only the
distinct-word frame, which is why BPE training at 100 TB is a word
count plus a driver loop over a small table — the same
external-bounded-loop idiom as PageRank / k-means
(similarity.kmeans_train_assign), with the per-round state
localCheckpointed to keep lineage flat.

Exactness: frequencies are exact integers and symbols are plain
strings, so the DuckDB oracle replays the training unrolled round by
round; the fold's greedy semantics are replayed in SQL via the
position-based equivalent (candidate positions, runs of consecutive
candidates, odd ranks win), proven equal by the hand-built run/overlap
tests in tests/test_round9.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

END_MARK = "</w>"


def bpe_init_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> initial BPE vocab: one row per distinct word with its
    corpus frequency and the word split into single-character symbols
    plus the terminal ``</w>`` marker. The ONLY corpus-sized stage of
    BPE training (one shuffle on the word key, partial counts
    map-side)."""
    w = df.select(F.explode(tokens(F.col(text_col))).alias("word"))
    chars = F.regexp_extract_all(F.col("word"), F.lit("."), 0)
    return (w.groupBy("word")
             .agg(F.count(F.lit(1)).cast("long").alias("freq"))
             .withColumn("syms",
                         F.concat(chars, F.array(F.lit(END_MARK)))))


def bpe_pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol-pair frequencies over the vocab, weighted by word
    frequency: (left_sym, right_sym, pair_count). Vocab-sized explode +
    one combinable shuffle on the pair key."""
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.get(F.col("syms"), i - 1).alias("l"),
                        F.get(F.col("syms"), i).alias("r"))),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (vocab.select("freq", F.explode(pairs).alias("_p"))
                 .groupBy(F.col("_p.l").alias("left_sym"),
                          F.col("_p.r").alias("right_sym"))
                 .agg(F.sum("freq").cast("long").alias("pair_count")))


def bpe_elect(pair_counts: DataFrame) -> DataFrame:
    """The 1-row argmax pair under the pinned total tie-break
    (pair_count DESC, left ASC, right ASC)."""
    return (pair_counts
            .orderBy(F.col("pair_count").desc(), F.col("left_sym").asc(),
                     F.col("right_sym").asc())
            .limit(1))


def bpe_apply_merge(vocab: DataFrame, elected: DataFrame) -> DataFrame:
    """Apply one elected merge to every vocab word: greedy left-to-right
    non-overlapping replacement of adjacent (left, right) with the
    concatenated symbol, as a single ``aggregate`` fold over the symbol
    array (map-side; the 1-row winner is broadcast).

    The fold IS the greedy scan: a freshly merged symbol becomes the
    accumulator's tail as ``left||right``, which can never equal
    ``left`` again (right is non-empty), so overlapping candidates —
    e.g. 'x x x' under ('x','x') -> ['xx','x'] — resolve exactly as
    the paper's left-to-right pass does."""
    a, b = F.col("left_sym"), F.col("right_sym")
    merged = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.get(acc, F.size(acc) - 1) == a) & (x == b),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(F.concat(a, b))),
        ).otherwise(F.concat(acc, F.array(x))))
    return (vocab.crossJoin(F.broadcast(elected))
                 .select("word", "freq", merged.alias("syms")))


def bpe_merge_step(vocab: DataFrame) -> DataFrame:
    """One full BPE training round: count pairs, elect, apply. Returns
    the post-merge vocab with the elected pair attached as constant
    (left_sym, right_sym, pair_count) columns so a single step is fully
    inspectable (and differential-testable) on its own."""
    elected = bpe_elect(bpe_pair_counts(vocab))
    out = bpe_apply_merge(vocab, elected)
    return out.crossJoin(F.broadcast(elected))


def bpe_train(df: DataFrame, n_merges: int = 8,
              text_col: str = "text") -> DataFrame:
    """N-round BPE training loop; returns the learned merge TABLE —
    (merge_rank, left_sym, right_sym, pair_count) — the artifact a
    tokenizer consumes. The vocab state is localCheckpointed each round
    (it is distinct-words-sized, not corpus-sized) so lineage stays
    flat; the corpus is scanned exactly once, by ``bpe_init_vocab``."""
    vocab = bpe_init_vocab(df, text_col).localCheckpoint(eager=False)
    merges = []
    for rank in range(1, n_merges + 1):
        elected = (bpe_elect(bpe_pair_counts(vocab))
                   .localCheckpoint(eager=False))
        if elected.isEmpty():
            # no adjacent pair left to merge (every word fully fused):
            # stop with the vocab state intact instead of letting the
            # empty 1-row frame crossJoin-empty the vocab and silently
            # vanish later ranks (r9 advice). The returned table is
            # explicitly shorter than n_merges — truncation is the
            # caller-visible signal.
            break
        merges.append(elected.select(
            F.lit(rank).cast("long").alias("merge_rank"),
            "left_sym", "right_sym", "pair_count"))
        vocab = (bpe_apply_merge(vocab, elected)
                 .localCheckpoint(eager=False))
    if not merges:
        schema = ("merge_rank long, left_sym string, right_sym string,"
                  " pair_count long")
        return df.sparkSession.createDataFrame([], schema)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out
