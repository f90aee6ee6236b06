"""Tokenizer artifact round-trip: persist trained models to parquet
and reload them into the encoders.

Training (bpe_train / unigram_em_train / the WordPiece vocab) and
encoding (bpe_encode / unigram_viterbi / wordpiece_segment) previously
handed off in-session only; these helpers make the artifact a real
table so a training job and the encode fleet can be separate
applications — the production shape, where one cluster trains the
tokenizer and thousands of ingest jobs reload it.

All three artifacts are MODEL-sized (merge table / piece table /
vocab), so a driver-side collect on load is by design — the repo's
float-stays-on-the-driver rule's sibling: models live on the driver,
corpora on the cluster. Each table carries an explicit order column so
the reloaded Python list is bit-identical to the trained one (parquet
has no row order; relying on file order would be the limit(1) trap).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

_BPE_SCHEMA = "merge_rank long, left_sym string, right_sym string"
_UNI_SCHEMA = "ord long, piece string, score_micro long"
_WP_SCHEMA = "ord long, piece string"


def _publish_model(df: DataFrame, path: str) -> None:
    """Publish a model-sized table as one parquet file via a temp
    sibling directory + rename, so a concurrent reader never sees the
    delete-then-write hole a plain ``mode("overwrite")`` opens on the
    live path (one trainer / many ingest readers is the stated
    production shape). The rename pair still leaves a sub-millisecond
    window where the path is absent — POSIX cannot atomically swap
    directories — so jobs that cannot tolerate even a transient
    read failure should version the artifact path per training run
    and flip a pointer instead of overwriting in place."""
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    old = f"{path}.old.{uuid.uuid4().hex[:8]}"
    swapped = False
    if os.path.isdir(path):
        os.rename(path, old)
        swapped = True
    try:
        os.rename(tmp, path)
    except OSError:
        if swapped:  # restore the previous artifact on failure
            os.rename(old, path)
        raise
    if swapped:
        shutil.rmtree(old, ignore_errors=True)


def save_bpe_merges(merges_df: DataFrame, path: str) -> None:
    """Persist a learned BPE merge table (``bpe_train``'s output —
    (merge_rank, left_sym, right_sym, ...)) as parquet. Only the
    rank-ordered pair columns are the model; extra columns (e.g.
    pair_count) are dropped so the artifact schema is stable across
    trainer variants (single / batched elections)."""
    _publish_model(
        merges_df.select("merge_rank", "left_sym", "right_sym"), path)


def load_bpe_merges(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    """Reload a merge table as the [(left, right)] list the encoders
    (``bpe_encode`` / ``bpe_apply_merges``, both engines) consume,
    in merge_rank order — the order IS the model (merges apply as a
    rank-ordered fold)."""
    rows = (spark.read.schema(_BPE_SCHEMA).parquet(path)
                 .orderBy("merge_rank").collect())
    return [(r["left_sym"], r["right_sym"]) for r in rows]


def save_unigram_pieces(spark: SparkSession, pairs, path: str) -> None:
    """Persist a unigram-LM piece table (``unigram_em_train``'s
    [(piece, score_micro)] output) as parquet with an explicit order
    column."""
    rows = [(i, p, int(s)) for i, (p, s) in enumerate(pairs)]
    _publish_model(spark.createDataFrame(rows, _UNI_SCHEMA), path)


def load_unigram_pieces(spark: SparkSession,
                        path: str) -> list[tuple[str, int]]:
    """Reload a piece table as the [(piece, score_micro)] list
    ``unigram_viterbi`` / ``unigram_encode`` consume (both engines)."""
    rows = (spark.read.schema(_UNI_SCHEMA).parquet(path)
                 .orderBy("ord").collect())
    return [(r["piece"], int(r["score_micro"])) for r in rows]


def save_wordpiece_vocab(spark: SparkSession, vocab, path: str) -> None:
    """Persist a WordPiece vocabulary (piece strings, continuation
    pieces carrying the ``##`` prefix) as parquet."""
    rows = [(i, p) for i, p in enumerate(vocab)]
    _publish_model(spark.createDataFrame(rows, _WP_SCHEMA), path)


def load_wordpiece_vocab(spark: SparkSession, path: str) -> list[str]:
    """Reload a WordPiece vocabulary as the piece list
    ``wordpiece_segment`` consumes (both engines)."""
    rows = (spark.read.schema(_WP_SCHEMA).parquet(path)
                 .orderBy("ord").collect())
    return [r["piece"] for r in rows]
