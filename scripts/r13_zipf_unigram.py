"""r13 one-off: the unigram-EM production-regime demo the r12 verdict
asked for (item 2) — r12's Zipf protocol (scripts/r12_zipf_train.py)
applied to ``unigram_em_train``.

The gate-corpus unigram keys train from UNIGRAM_DEMO_PIECES (a toy
seed far below FOLD_MAX_PIECES=512), so the 30k-piece regime the
Arrow engine exists for had no end-to-end training row. This script:

1. FIXTURE: the same Zipf(s=1.1) corpus over a 60k-word generator
   vocabulary (deterministic RandomState(42), words 3-12 letters),
   50k docs x 200 words = 10M tokens.
2. SEED: a production-sized seed vocabulary in the SentencePiece
   style (Kudo 2018 §3.2: all single characters for coverage + the
   most frequent substrings), built driver-side from the model-sized
   distinct-word frequency table: every char + the top substrings of
   length 2..8 by estimated corpus frequency, ~32k pieces, scored
   ln(freq/total) in micros. A 32k seed >> FOLD_MAX_PIECES, so every
   per-round segmentation must auto-resolve to the Arrow engine.
3. TRAIN: hard-EM rounds via the real ``unigram_em_train`` API (one
   n_rounds=1 call per round, chaining the returned table — bit-
   identical to the internal loop, which re-derives the word
   frequency frame per call), logging per-round wall and the pruned
   vocabulary size (min_count=2: Kudo's shrink step, hard-count
   form).
4. ENCODE: ``unigram_encode`` over the full corpus with the final
   table (auto -> Arrow), min-of-2 wall + pieces-per-word fertility.

Results land as SCALING.md rows ("r13: production-regime unigram").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

OUT_DIR = "/tmp/r13_zipf"
PARQUET = os.path.join(OUT_DIR, "documents.parquet")
LOG = os.path.join(OUT_DIR, "progress.log")
V = 60_000
DOCS = 50_000
WPD = 200
ZIPF_S = 1.1
SEED_TARGET = 32_000
EM_ROUNDS = 6


def build_fixture() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(PARQUET):
        log(f"# fixture exists: {PARQUET}")
        return
    os.makedirs(OUT_DIR, exist_ok=True)
    rs = np.random.RandomState(42)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < V:
        n = V - len(vocab)
        lens = rs.randint(3, 13, size=n)
        for ln in lens:
            w = "".join(rs.choice(letters, size=ln))
            if w not in seen:
                seen.add(w)
                vocab.append(w)
    words = np.array(vocab)
    p = 1.0 / np.arange(1, V + 1) ** ZIPF_S
    cum = np.cumsum(p / p.sum())
    t0 = time.time()
    doc_ids, texts = [], []
    for d in range(DOCS):
        idx = np.searchsorted(cum, rs.rand(WPD))
        doc_ids.append(d)
        texts.append(" ".join(words[idx]))
    tbl = pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                    "source": pa.array(["zipf"] * DOCS),
                    "text": pa.array(texts)})
    pq.write_table(tbl, PARQUET)
    log(f"# fixture built in {time.time() - t0:.1f}s -> {PARQUET}")


def log(msg: str) -> None:
    print(msg, flush=True)
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(LOG, "a") as fh:
        fh.write(msg + "\n")


def build_seed(word_freq: list[tuple[str, int]]) -> list[tuple[str, int]]:
    """SentencePiece-style seed: all chars + top substrings by
    estimated frequency (each substring credited its containing
    word's corpus frequency), ln(freq/total) scores in micros."""
    import math
    from collections import Counter

    sub_freq: Counter = Counter()
    chars: Counter = Counter()
    for w, f in word_freq:
        for c in set(w):
            chars[c] += f
        for ln in range(2, 9):
            for i in range(len(w) - ln + 1):
                sub_freq[w[i:i + ln]] += f
    top = sub_freq.most_common(SEED_TARGET - len(chars))
    seed = list(chars.items()) + top
    total = sum(f for _, f in seed)
    return [(p, int(round(math.log(f / total) * 1_000_000)))
            for p, f in seed]


def main() -> None:
    build_fixture()

    from pyspark.sql import functions as F

    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.operators.subword import (
        FOLD_MAX_PIECES, unigram_em_train, unigram_encode)
    from tf_prisma_api_data_ingestion_spark.operators.text import tokens
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r13_zipf_unigram")
    docs = spark.read.parquet(PARQUET)
    wf = (docs.select(F.explode(tokens(F.col("text"))).alias("word"))
              .groupBy("word").agg(F.count(F.lit(1)).alias("f"))
              .collect())
    word_freq = [(r["word"], int(r["f"])) for r in wf]
    log(f"# corpus: {docs.count()} docs, {len(word_freq)} distinct words, "
        f"{sum(f for _, f in word_freq)} tokens")

    t0 = time.time()
    pairs = build_seed(word_freq)
    log(f"# seed: {len(pairs)} pieces (chars + top substrings) in "
        f"{time.time() - t0:.1f}s; FOLD_MAX_PIECES={FOLD_MAX_PIECES} "
        f"-> auto resolves to ARROW")

    # warm the round machinery once on a tiny slice
    unigram_em_train(docs.limit(200), pairs[:600], n_rounds=1,
                     max_word_len=16)

    for rnd in range(1, EM_ROUNDS + 1):
        t0 = time.time()
        pairs = unigram_em_train(docs, pairs, n_rounds=1,
                                 max_word_len=16, min_count=2)
        log(f"# EM round {rnd}: {time.time() - t0:.1f}s, "
            f"vocab -> {len(pairs)} pieces")

    enc = unigram_encode(docs, pairs, max_word_len=16)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        materialize(enc)
        best = min(best, time.time() - t0)
    stats = (unigram_encode(docs, pairs, max_word_len=16)
             .agg(F.sum("n_words").alias("w"),
                  F.sum("n_pieces").alias("p")).head())
    fert = stats["p"] / stats["w"]
    log(f"# encode: {best:.2f}s for {stats['w']} words -> "
        f"{stats['p']} pieces (fertility {fert:.3f})")
    spark.stop()
    log("# DONE")


if __name__ == "__main__":
    main()
