"""r11 one-off: measurements for the round's four performance claims.

1. MODEL-SIZE axis (the r10 verdict's capability seam): BPE corpus
   encode at sf0.1 under synthetic PROGRESSIVE merge tables of
   growing rank count — the fold engine (model in the plan) vs the
   Arrow engine (model in the closure). The tables genuinely fire:
   stage 1 is every letter-letter pair, stage 2 fuses the merged
   2-grams with a third letter, so most corpus words segment down.
   The headline row is the >= 10k-rank table on Arrow — the
   production-vocabulary path the fold engine cannot plan.
2. Unigram / WordPiece >= 10k-entry tables on Arrow at sf0.1
   (singles + doubles + triples, so the big vocab fires too).
3. Batched vs sequential BPE TRAINING (16 merges, batch_m=4) at
   sf0.1 — the rounds-collapse claim.
4. plan-corpus-datasheet decade rows x1/x10/x100 after the r11
   single-scan fold (the r10b table read 6.6x on the top decade).

Protocol v2: warm at sf0.001 first, min-of-2 per cell (1 pass at the
x100 decade), full materialization via actions.materialize.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.1"

LETTERS = "etaoinshrdlucmfwypvbgk"


def synth_bpe_merges(n: int) -> list[tuple[str, str]]:
    pairs: list[tuple[str, str]] = []
    for a in LETTERS:
        for b in LETTERS:
            pairs.append((a, b))
            if len(pairs) >= n:
                return pairs
    for a in LETTERS:
        for b in LETTERS:
            for c in LETTERS:
                pairs.append((a + b, c))
                if len(pairs) >= n:
                    return pairs
    raise ValueError(f"cannot synthesize {n} merges")


def synth_unigram_pieces(n: int) -> list[tuple[str, int]]:
    az = "abcdefghijklmnopqrstuvwxyz"
    pieces = [(c, -3_000_000) for c in az]
    pieces += [(d, -4_000_000) for d in "0123456789"]
    for a in az:
        for b in az:
            pieces.append((a + b, -5_500_000))
            if len(pieces) >= n:
                return pieces[:n]
    for a in az:
        for b in az:
            for c in az:
                pieces.append((a + b + c, -8_000_000))
                if len(pieces) >= n:
                    return pieces[:n]
    raise ValueError(f"cannot synthesize {n} pieces")


def synth_wp_vocab(n: int) -> list[str]:
    az = "abcdefghijklmnopqrstuvwxyz"
    vocab = list(az) + ["##" + c for c in az]
    for a in az:
        for b in az:
            vocab.append("##" + a + b)
            if len(vocab) >= n:
                return vocab[:n]
    for a in az:
        for b in az:
            for c in az:
                vocab.append("##" + a + b + c)
                if len(vocab) >= n:
                    return vocab[:n]
    raise ValueError(f"cannot synthesize {n} vocab entries")


def timed(fn, passes: int = 2) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.operators.bpe import (
        bpe_encode, bpe_train, bpe_train_batched)
    from tf_prisma_api_data_ingestion_spark.operators.subword import (
        unigram_encode, wordpiece_encode)
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r11scale")
    docs01 = spark.read.parquet(f"{SF01}/documents.parquet")
    warm = spark.read.parquet(f"{SF001}/documents.parquet")

    # ---- 1. BPE model-size axis at sf0.1 ----
    for R in (8, 32, 64):
        table = synth_bpe_merges(R)
        materialize(bpe_encode(warm, table, engine="fold"))
        w = timed(lambda: materialize(
            bpe_encode(docs01, table, engine="fold")))
        print(f"RES bpe-encode fold R={R} sf0.1 {w:.2f}s", flush=True)
    for R in (8, 64, 484, 1000, 10240):
        table = synth_bpe_merges(R)
        materialize(bpe_encode(warm, table, engine="arrow"))
        w = timed(lambda: materialize(
            bpe_encode(docs01, table, engine="arrow")))
        print(f"RES bpe-encode arrow R={R} sf0.1 {w:.2f}s", flush=True)

    # ---- 2. unigram / wordpiece 10k-entry Arrow rows ----
    up = synth_unigram_pieces(10_240)
    materialize(unigram_encode(warm, up, engine="arrow"))
    w = timed(lambda: materialize(
        unigram_encode(docs01, up, engine="arrow")))
    print(f"RES unigram-encode arrow P=10240 sf0.1 {w:.2f}s", flush=True)
    wv = synth_wp_vocab(10_240)
    materialize(wordpiece_encode(warm, wv, engine="arrow"))
    w = timed(lambda: materialize(
        wordpiece_encode(docs01, wv, engine="arrow")))
    print(f"RES wordpiece-encode arrow V=10240 sf0.1 {w:.2f}s",
          flush=True)

    # ---- 3. batched vs sequential training, 16 merges ----
    materialize(bpe_train(warm, 4))
    w = timed(lambda: materialize(bpe_train(docs01, 16)), passes=1)
    print(f"RES bpe-train sequential M16 sf0.1 {w:.2f}s", flush=True)
    materialize(bpe_train_batched(warm, 4, batch_m=4))
    w = timed(lambda: materialize(
        bpe_train_batched(docs01, 16, batch_m=4)), passes=1)
    print(f"RES bpe-train batched M16 m=4 sf0.1 {w:.2f}s", flush=True)

    # ---- 4. datasheet decades after the single-scan fold ----
    from tf_prisma_api_data_ingestion_spark import cache
    from tf_prisma_api_data_ingestion_spark.catalog import QUERIES
    fn = QUERIES["plan-corpus-datasheet"]
    for label, d, passes in (("sf0.1", SF01, 2),
                             ("sf1eq", "/tmp/sf1eq", 2),
                             ("sf10docs", "/tmp/sf10docs", 1)):
        if not os.path.exists(f"{d}/documents.parquet"):
            print(f"RES datasheet {label} SKIPPED (no corpus)",
                  flush=True)
            continue
        materialize(fn(spark, SF001))
        cache.release_all(blocking=True)
        best = float("inf")
        for _ in range(passes):
            t0 = time.time()
            materialize(fn(spark, d))
            best = min(best, time.time() - t0)
            cache.release_all(blocking=True)
        print(f"RES datasheet {label} {best:.2f}s", flush=True)

    spark.stop()


def train_1k_demo() -> None:
    """End-to-end production-path demonstration: train a 1,024-merge
    vocabulary with batched elections (m=32 -> 32 rounds) on sf0.1,
    then encode the same corpus with the TRAINED table — the auto
    dial routes the 1,024-rank apply to the Arrow engine. Run with
    `python scripts/r11_tokenizer_scale.py train1k`."""
    import time

    from tf_prisma_api_data_ingestion_spark.actions import materialize
    from tf_prisma_api_data_ingestion_spark.operators.bpe import (
        bpe_encode, bpe_train_batched)
    from tf_prisma_api_data_ingestion_spark.session import get_spark

    spark = get_spark("r11train1k")
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    t0 = time.time()
    merges = bpe_train_batched(docs, n_merges=1024, batch_m=32)
    rows = merges.orderBy("merge_rank").collect()
    t_train = time.time() - t0
    print(f"RES train1k merges={len(rows)} batch_m=32 "
          f"{t_train:.1f}s", flush=True)
    pairs = [(r["left_sym"], r["right_sym"]) for r in rows]
    t0 = time.time()
    enc = bpe_encode(docs, pairs)   # auto dial -> arrow at 1k ranks
    materialize(enc)
    t_enc = time.time() - t0
    stats = enc.selectExpr("sum(n_words) w", "sum(n_pieces) p").first()
    print(f"RES train1k encode {t_enc:.1f}s ppw={stats['p']/stats['w']:.3f}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    if "train1k" in sys.argv:
        train_1k_demo()
    else:
        main()
