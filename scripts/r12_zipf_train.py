"""r12 one-off: the production-regime BPE training demo the r11
verdict asked for (item 3).

The r11 batched-trainer demos fully FUSED their corpora after ~113 of
437 possible merges — the gate generator's vocabulary is small, so the
8k-30k-merge regime `bpe_train_batched` and the Arrow encoder exist
for had no end-to-end row. This script synthesizes a heavy-tailed
corpus in that regime and runs the full loop:

1. FIXTURE: a Zipf(s=1.1) corpus over a 60k-word generator vocabulary
   (deterministic numpy RandomState; words are 3-12 random letters,
   so pair diversity is deep and 8,192 merges nowhere near fuse it),
   50k docs x 200 words = 10M tokens, written once to
   /tmp/r12_zipf/documents.parquet.
2. TRAIN: bpe_train_batched(n_merges=8192, batch_m=64) to completion
   — 128 round-batches, each one distributed pair count + top-256
   TakeOrdered slice + 64 fold projections over the distinct-word
   frame. Recorded: total wall, wall per round-batch, merges/sec.
   A short 512-merge run records the early-round wall separately
   (rounds get slightly cheaper as words fuse).
3. ENCODE: bpe_encode(engine='auto') with the trained 8,192-rank
   table — auto dials past FOLD_MAX_MERGES=64 onto the Arrow engine
   (one MapInPandas node; the model rides in the closure). Recorded:
   corpus encode wall + output sanity (pieces-per-word fertility must
   sit well above 1 — a fused corpus would read exactly 1).

Results land as SCALING.md rows ("r12: production-regime trainer").
Protocol: min-of-2 for the encode cell; training is a single pass
(it is 128 sequential rounds — its own internal repetition is the
stability), canary-bracketed by one tiny warm round.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

OUT_DIR = "/tmp/r12_zipf"
PARQUET = os.path.join(OUT_DIR, "documents.parquet")
V = 60_000
DOCS = 50_000
WPD = 200
ZIPF_S = 1.1


def build_fixture() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(PARQUET):
        print(f"# fixture exists: {PARQUET}", flush=True)
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
    # Zipf pmf over ranks 1..V, sampled by inverse-CDF on uniforms
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
    print(f"# fixture built in {time.time() - t0:.1f}s -> {PARQUET}",
          flush=True)


LOG = os.path.join(OUT_DIR, "progress.log")


def log(msg: str) -> None:
    print(msg, flush=True)
    with open(LOG, "a") as fh:
        fh.write(msg + "\n")


def main() -> None:
    build_fixture()

    from pyspark.sql import functions as F

    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.operators.bpe import (
        bpe_encode, bpe_init_vocab, bpe_train_batched)
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r12_zipf_train")
    docs = spark.read.parquet(PARQUET)
    n_docs = docs.count()
    v0 = bpe_init_vocab(docs)
    n_words = v0.count()
    n_syms = v0.select(F.sum(F.size("syms"))).head()[0]
    log(f"# corpus: {n_docs} docs, {n_words} distinct words, "
          f"{n_syms} initial symbols")

    # warm the round machinery on a tiny slice
    bpe_train_batched(docs.limit(200), n_merges=64, batch_m=64).collect()

    # early-round wall: 512 merges = 8 round-batches
    t0 = time.time()
    early = bpe_train_batched(docs, n_merges=512, batch_m=64)
    n_early = early.count()
    w_early = time.time() - t0
    log(f"# early: {n_early} merges in {w_early:.1f}s "
        f"({w_early / (n_early / 64):.2f}s/round-batch)")

    # the production-regime run: 8,192 merges, 128 round-batches
    t0 = time.time()
    merges = bpe_train_batched(docs, n_merges=8192, batch_m=64)
    merges = merges.localCheckpoint()  # pin the artifact for reuse
    n_m = merges.count()
    w_train = time.time() - t0
    rounds = n_m / 64
    log(f"# train: {n_m} merges in {w_train:.1f}s "
        f"({w_train / rounds:.2f}s/round-batch, "
        f"{n_m / w_train:.0f} merges/s)")

    # encode the corpus with the trained table; auto -> Arrow engine
    enc = bpe_encode(docs, merges, engine="auto")
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        materialize(enc)
        best = min(best, time.time() - t0)
    stats = (bpe_encode(docs, merges, engine="auto")
             .agg(F.sum("n_words").alias("w"),
                  F.sum("n_pieces").alias("p")).head())
    fert = stats["p"] / stats["w"]
    log(f"# encode: {best:.2f}s for {stats['w']} words -> "
        f"{stats['p']} pieces (fertility {fert:.3f})")
    if fert <= 1.001:
        log("# WARNING: corpus fully fused — not the production "
            "regime this demo exists for")
    spark.stop()


if __name__ == "__main__":
    main()
