"""r14 one-off: the r12 Zipf production-regime trainer protocol
(scripts/r12_zipf_train.py — 50k docs x 200 words, Zipf(1.1) over a
60k-word vocabulary, 10M tokens) re-run with basis="bytes", the
byte-level v0 alphabet (r13 verdict item 5): confirms the 256-symbol
v0 does not change the trainer's round-wall behavior. On this ASCII
corpus each character is one UTF-8 byte, so the v0 SYMBOL COUNT per
word is identical to the chars basis — the difference is symbol
identity (2-char hex pairs vs 1-char strings, slightly wider shuffle
keys) and the closed 256-symbol base alphabet. Recorded: early and
full-run s/round-batch, encode wall, fertility — side by side with
the r12 chars rows in SCALING.md ("r14: byte-basis production
regime").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from r12_zipf_train import PARQUET, build_fixture  # noqa: E402

LOG = "/tmp/r12_zipf/bytes.log"


def log(msg: str) -> None:
    print(msg, flush=True)
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as fh:
        fh.write(msg + "\n")


def main() -> None:
    build_fixture()

    from pyspark.sql import functions as F

    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.operators.bpe import (
        bpe_encode, bpe_init_vocab, bpe_train_batched)
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r14_zipf_bytes")
    docs = spark.read.parquet(PARQUET)
    n_docs = docs.count()
    v0 = bpe_init_vocab(docs, basis="bytes")
    n_words = v0.count()
    n_syms = v0.select(F.sum(F.size("syms"))).head()[0]
    log(f"# corpus: {n_docs} docs, {n_words} distinct words, "
        f"{n_syms} initial byte symbols")

    bpe_train_batched(docs.limit(200), n_merges=64, batch_m=64,
                      basis="bytes").collect()  # warm

    t0 = time.time()
    early = bpe_train_batched(docs, n_merges=512, batch_m=64,
                              basis="bytes")
    n_early = early.count()
    w_early = time.time() - t0
    log(f"# early: {n_early} merges in {w_early:.1f}s "
        f"({w_early / (n_early / 64):.2f}s/round-batch)")

    t0 = time.time()
    merges = bpe_train_batched(docs, n_merges=8192, batch_m=64,
                               basis="bytes")
    merges = merges.localCheckpoint()
    n_m = merges.count()
    w_train = time.time() - t0
    rounds = n_m / 64
    log(f"# train: {n_m} merges in {w_train:.1f}s "
        f"({w_train / rounds:.2f}s/round-batch, "
        f"{n_m / w_train:.0f} merges/s)")

    enc = bpe_encode(docs, merges, engine="auto", basis="bytes")
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        materialize(enc)
        best = min(best, time.time() - t0)
    stats = (bpe_encode(docs, merges, engine="auto", basis="bytes")
             .agg(F.sum("n_words").alias("w"),
                  F.sum("n_pieces").alias("p")).head())
    fert = stats["p"] / stats["w"]
    log(f"# encode: {best:.2f}s for {stats['w']} words -> "
        f"{stats['p']} pieces (fertility {fert:.3f})")
    if fert <= 1.001:
        log("# WARNING: corpus fully fused — not the production "
            "regime this demo exists for")
    spark.stop()
    log("# DONE")


if __name__ == "__main__":
    main()
