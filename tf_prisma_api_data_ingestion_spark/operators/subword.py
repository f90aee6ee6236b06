"""Subword segmentation beyond BPE: the unigram language model
(Kudo 2018, "Subword Regularization: Improving Neural Network
Translation Models with Multiple Subword Candidates" — the
SentencePiece trainer) and WordPiece greedy longest-match-first
inference (Schuster & Nakajima 2012; the BERT tokenizer). Together
with operators/bpe.py this completes the three major subword
families a pretraining pipeline chooses between (north-star
extension; the reference has no tokenizer at all).

Scale shape — identical to bpe_encode's, and for the same reason:
the corpus is tokenized ONCE into (doc, word) counts (one map-side-
combinable shuffle); all segmentation work runs over the
DISTINCT-WORD frame only (Zipf: vocabulary-sized, not corpus-sized);
per-doc totals come from one hash join on the compact word key plus
one aggregation. No UDFs, no windows, no driver loops in the encode
path.

Exactness: piece scores are INTEGER micro-log-probs passed in as
literals (model-sized driver traffic, the probe-weights / k-means-
centroids / BPE-merge-table idiom), so the Viterbi max-sum DP is
exact int64 arithmetic with a pinned tie-break and the DuckDB oracle
replays it bit-for-bit with unrolled DP rounds. The one place a
float exists — the M-step's ln(count/total) quantization — runs ONCE
on the driver in plain Python between EM rounds, so the Spark plan
and the pytest Python mirror consume the same literal table and the
float cancels out of every differential check.

The Viterbi fold rides inside one codegen'd projection over stored
columns (the word frame is post-shuffle, so nothing expensive gets
re-inlined per lambda element — the CollapseProject trap
dedup.substring_dup_coverage documents). Demo-scale piece tables
embed as a literal MAP; a production vocabulary (tens of thousands
of pieces) would switch the lookup to an Arrow-batched mapInPandas —
the documented escape hatch bpe_apply_merges also declares, same
contract.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

UNK = "<unk>"

# Above this many vocabulary entries the fold engine's literal
# create_map (and the Viterbi fold's K probes against it) stops being
# the right plan shape — the PLAN grows with the model — and the
# Arrow-batched mapInPandas engine (operators/tokenizer_arrow) takes
# over. Both engines are bit-identical; tests/test_tokenizer_arrow.py
# pins the equivalence and the *-arrow catalog keys run the same
# DuckDB oracles as their fold twins.
FOLD_MAX_PIECES = 512

_CAND_T = "array<struct<s:bigint,nnp:bigint,nbp:bigint,ps:array<string>>>"


def _piece_pairs(pieces, unk: str | None = None) -> list[tuple[str, int]]:
    """Normalize a piece table to a driver-side [(piece, score_micro)]
    list: either a DataFrame with (piece, score_micro) columns
    (collected here — model-sized, the trained-artifact idiom) or an
    already-driver-side sequence of pairs. ``unk`` is the caller's
    fallback label: a piece EQUAL to it is rejected, because
    ``unigram_estep``'s zero-fill vocab appends the unk row itself —
    a literal '<unk>' piece would emit duplicate rows and double-join
    the pooled unk count, identically in the DuckDB oracle (r10
    advice: the differential gate cannot catch it)."""
    if isinstance(pieces, DataFrame):
        rows = pieces.select("piece", "score_micro").collect()
        pairs = [(r["piece"], int(r["score_micro"])) for r in rows]
    else:
        pairs = [(str(p), int(s)) for p, s in pieces]
    if not pairs:
        raise ValueError("piece table is empty")
    seen = set()
    for piece, _ in pairs:
        if not piece:
            raise ValueError("empty-string piece in table")
        if unk is not None and piece == unk:
            raise ValueError(
                f"piece table contains the unk label {unk!r}; unk is "
                "the fallback, not a piece")
        if piece in seen:
            # a duplicate would also crash create_map under ANSI
            # DUPLICATE_MAP_KEY — fail with the cause, not the symptom
            raise ValueError(f"duplicate piece in table: {piece!r}")
        seen.add(piece)
    return pairs


def _lit_map(pairs: list[tuple[str, int]]) -> Column:
    flat: list[Column] = []
    for k, v in pairs:
        flat.append(F.lit(k))
        flat.append(F.lit(v).cast("long"))
    return F.create_map(*flat)


def viterbi_best(word: Column, pairs: list[tuple[str, int]],
                 unk_score: int) -> Column:
    """Exact Viterbi decode of one word under integer micro-log-prob
    piece scores: returns struct(s, nnp, nbp, ps) for the BEST
    segmentation — max total score, ties broken by fewer pieces, then
    by the longer final piece (all encoded so Spark's native struct
    ordering picks the winner: s ASC-max, nnp = -n_pieces, nbp =
    -backpointer).

    best[j] = max over piece lengths l of best[j-l] + score(word[j-l:j]),
    where a length-1 piece missing from the vocabulary falls back to
    ``unk_score`` (guaranteeing a path — Kudo 2018's character
    coverage), and longer missing pieces are simply not edges. One
    ``aggregate`` fold over positions; each step is K literal-map
    lookups — pure map-side, no UDF.
    """
    pmap = _lit_map(pairs)
    K = max(len(p) for p, _ in pairs)
    n = F.length(word)
    init = F.array(F.struct(
        F.lit(0).cast("long").alias("s"),
        F.lit(0).cast("long").alias("nnp"),
        F.lit(0).cast("long").alias("nbp"),
        F.array().cast("array<string>").alias("ps")))

    def step(acc, j):
        cands = []
        for l in range(1, K + 1):
            sub = F.substring(word, j - F.lit(l - 1), F.lit(l))
            sc = F.element_at(pmap, sub)
            if l == 1:
                sc = F.coalesce(sc, F.lit(unk_score).cast("long"))
                valid = F.lit(True)
            else:
                valid = (j >= l) & sc.isNotNull()
            prev = F.element_at(acc, j - F.lit(l - 1))
            cand = F.struct(
                (prev["s"] + sc).alias("s"),
                (prev["nnp"] - 1).alias("nnp"),
                (F.lit(l) - j).cast("long").alias("nbp"),
                F.concat(prev["ps"], F.array(sub)).alias("ps"))
            cands.append(F.when(valid, F.array(cand))
                          .otherwise(F.array().cast(_CAND_T)))
        best_j = F.array_max(F.flatten(F.array(*cands)))
        return F.concat(acc, F.array(best_j))

    arr = F.aggregate(F.sequence(F.lit(1), n), init, step)
    return F.element_at(arr, n + 1)


def unigram_viterbi(words: DataFrame, pieces, word_col: str = "word",
                    max_word_len: int = 24, unk: str = UNK,
                    unk_score: int = -100_000_000,
                    engine: str = "auto",
                    fold_max_pieces: int = FOLD_MAX_PIECES) -> DataFrame:
    """Segment a distinct-word frame with the unigram-LM Viterbi
    decode. Adds (pieces array<string>, n_pieces, score_micro); words
    longer than ``max_word_len`` become a single ``unk`` piece at
    ``unk_score`` (the WordPiece very-long-word rule, adopted so the
    DP depth — and the oracle's unrolled rounds — stay bounded).

    Two bit-identical engines behind a model-size dial: ``fold`` (at
    or below ``fold_max_pieces`` pieces) embeds the piece table as a
    literal map inside one codegen'd Viterbi fold — zero Python,
    oracle-replayable; ``arrow`` (above) runs the same exact int64 DP
    in an Arrow-batched mapInPandas whose closure carries the table
    as a dict (tokenizer_arrow.unigram_viterbi_arrow) — the plan no
    longer grows with the vocabulary, the production path for real
    30k-piece models."""
    pairs = _piece_pairs(pieces, unk=unk)
    if engine == "auto":
        engine = "fold" if len(pairs) <= fold_max_pieces else "arrow"
    if engine == "arrow":
        from .tokenizer_arrow import unigram_viterbi_arrow
        return unigram_viterbi_arrow(
            words, pairs, word_col=word_col, max_word_len=max_word_len,
            unk=unk, unk_score=unk_score)
    if engine != "fold":
        raise ValueError(f"unknown engine {engine!r}")
    w = F.col(word_col)
    best = viterbi_best(w, pairs, unk_score)
    # isNull pins the NULL-word behavior to the Arrow kernel's (one
    # unk piece): without it length(NULL) makes long_w NULL and the
    # otherwise() branch propagates NULL pieces — unreachable via the
    # explode(tokens()) encoders but divergent on caller-supplied
    # word frames (r11 ADVICE)
    long_w = (w.isNull() | (F.length(w) > max_word_len)
              | (F.length(w) == 0))
    out = words.select(
        "*",
        F.when(long_w, F.array(F.lit(unk)))
         .otherwise(best["ps"]).alias("pieces"),
        F.when(long_w, F.lit(1).cast("long"))
         .otherwise(-best["nnp"]).alias("n_pieces"),
        F.when(long_w, F.lit(unk_score).cast("long"))
         .otherwise(best["s"]).alias("score_micro"))
    # Hard materialization boundary: without it, a downstream Generate
    # (unigram_estep's explode of `pieces`) collapses onto this
    # projection and re-evaluates the WHOLE Viterbi fold per emitted
    # element — measured 20.9s vs 0.7s over a 31-word vocab at sf0.1,
    # x12/decade as the vocabulary grows (the CollapseProject trap
    # dedup.substring_dup_coverage documents, in Generate form). A
    # repartition() does NOT barrier it (measured: the collapse
    # crosses RepartitionByExpression); localCheckpoint does, and the
    # frame is vocab-sized — the bpe_train lineage-flattening idiom.
    return out.localCheckpoint(eager=False)


def _word_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    # checkpointed so the corpus tokenizes ONCE in the executed plan:
    # the distinct-word branch would otherwise prune id_col into its
    # own scan (no exchange reuse) and re-tokenize the whole corpus —
    # the bpe_encode fix, measured 3.4x at the 500k-doc decade
    return (df.select(F.col(id_col),
                      F.explode(tokens(F.col(text_col))).alias("word"))
              .groupBy(id_col, "word")
              .agg(F.count(F.lit(1)).alias("_c"))
              .localCheckpoint(eager=False))


def unigram_encode(df: DataFrame, pieces, text_col: str = "text",
                   id_col: str = "doc_id", max_word_len: int = 24,
                   unk_score: int = -100_000_000,
                   engine: str = "auto") -> DataFrame:
    """Encode a corpus with a unigram-LM piece table — per document
    (id, n_words, n_pieces, score_micro), where score_micro is the
    corpus-exact total Viterbi log-likelihood in micro-nats. The
    unigram twin of bpe.bpe_encode, same three-stage scale shape."""
    wc = _word_counts(df, text_col, id_col)
    seg = unigram_viterbi(
        wc.select("word").distinct(), pieces,
        max_word_len=max_word_len, unk_score=unk_score, engine=engine,
    ).select("word", "n_pieces", "score_micro")
    return (wc.join(seg, "word")
            .groupBy(id_col)
            .agg(F.sum("_c").cast("long").alias("n_words"),
                 F.sum(F.col("_c") * F.col("n_pieces")).cast("long")
                  .alias("n_pieces"),
                 F.sum(F.col("_c") * F.col("score_micro")).cast("long")
                  .alias("score_micro")))


def unigram_estep(df: DataFrame, pieces, text_col: str = "text",
                  max_word_len: int = 24, unk: str = UNK,
                  unk_score: int = -100_000_000,
                  engine: str = "auto") -> DataFrame:
    """Hard-EM E-step (Viterbi-EM, the standard hard variant of Kudo
    2018 §3.2's EM): corpus piece counts under the CURRENT model's
    best segmentations. Returns one row per vocabulary piece plus the
    ``unk`` row, zero-filled — a stable, model-sized frame whose
    collect is the M-step's input. The corpus contributes one word
    count (map-side combinable); everything after is vocab-sized."""
    pairs = _piece_pairs(pieces, unk=unk)
    spark = df.sparkSession
    member = _lit_map([(p, 1) for p, _ in pairs])
    freq = (df.select(F.explode(tokens(F.col(text_col))).alias("word"))
              .groupBy("word")
              .agg(F.count(F.lit(1)).cast("long").alias("_f")))
    seg = unigram_viterbi(freq, pairs, max_word_len=max_word_len,
                          unk=unk, unk_score=unk_score, engine=engine)
    # an emitted piece outside the vocabulary is exactly the length-1
    # unk_score fallback edge — it counts under the unk label (Kudo
    # 2018's character-coverage residual), not as a phantom piece
    emitted = F.explode("pieces").alias("piece")
    used = (seg.select("_f", emitted)
               .select("_f",
                       F.when(F.element_at(member, F.col("piece"))
                               .isNotNull(), F.col("piece"))
                        .otherwise(F.lit(unk)).alias("piece"))
               .groupBy("piece")
               .agg(F.sum("_f").cast("long").alias("piece_count")))
    vocab = spark.createDataFrame(
        [(p,) for p, _ in pairs] + [(unk,)], "piece string")
    return (vocab.join(used, "piece", "left")
                 .select("piece",
                         F.coalesce("piece_count", F.lit(0))
                          .cast("long").alias("piece_count")))


def unigram_mstep(counts: list[tuple[str, int]], unk: str = UNK,
                  min_count: int = 1) -> list[tuple[str, int]]:
    """Driver-side M-step: renormalize hard-EM counts into integer
    micro-log-probs. Multi-char pieces below ``min_count`` are pruned
    (Kudo 2018's vocabulary shrinking, hard-count form); single chars
    and ``unk`` always survive with add-one smoothing so every word
    keeps a path. Pure Python on a model-sized list — the one float
    in the EM loop, shared verbatim with the pytest mirror."""
    kept = []
    for p, c in counts:
        if p == unk or len(p) == 1:
            kept.append((p, c + 1))
        elif c >= min_count:
            kept.append((p, c))
    total = sum(c for _, c in kept)
    return [(p, int(round(math.log(c / total) * 1_000_000)))
            for p, c in kept]


def unigram_em_train(df: DataFrame, init_pieces, n_rounds: int = 2,
                     text_col: str = "text", max_word_len: int = 24,
                     unk: str = UNK, unk_score: int = -100_000_000,
                     min_count: int = 1, engine: str = "auto"):
    """N rounds of hard-EM unigram-LM training: E-step on the cluster
    (exact integer counts), M-step on the driver (model-sized). The
    external-bounded-loop idiom of bpe_train / kmeans_train_assign —
    per-round cluster work is one word count plus a vocab-sized
    segmentation; driver traffic is the piece table. Returns the
    final [(piece, score_micro)] list, ready for unigram_encode.
    ``unk`` is excluded from the learned table (it is the fallback,
    not a piece)."""
    pairs = _piece_pairs(init_pieces, unk=unk)
    freq = (df.select(F.explode(tokens(F.col(text_col))).alias("word"))
              .groupBy("word")
              .agg(F.count(F.lit(1)).cast("long").alias("_f"))
              .localCheckpoint(eager=False))
    for _ in range(n_rounds):
        seg = unigram_viterbi(freq, pairs, max_word_len=max_word_len,
                              unk=unk, unk_score=unk_score,
                              engine=engine)
        rows = (seg.select("_f", F.explode("pieces").alias("piece"))
                   .groupBy("piece")
                   .agg(F.sum("_f").cast("long").alias("c"))
                   .collect())
        got = {r["piece"]: int(r["c"]) for r in rows}
        in_vocab = {p for p, _ in pairs}
        counts = [(p, got.get(p, 0)) for p, _ in pairs]
        # out-of-vocab emissions are the unk fallback edges (plus the
        # literal unk piece from over-long words) — pool them under unk
        counts.append((unk, sum(c for p, c in got.items()
                                if p not in in_vocab)))
        scored = unigram_mstep(counts, unk=unk, min_count=min_count)
        pairs = [(p, s) for p, s in scored if p != unk]
    return pairs


# ---------------------------------------------------------------------
# WordPiece (Schuster & Nakajima 2012; BERT's tokenizer)
# ---------------------------------------------------------------------

WP_UNK = "[UNK]"
WP_CONT = "##"


def wordpiece_segment(words: DataFrame, vocab, word_col: str = "word",
                      unk: str = WP_UNK, max_word_len: int = 24,
                      engine: str = "auto",
                      fold_max_pieces: int = FOLD_MAX_PIECES,
                      ) -> DataFrame:
    """Greedy longest-match-first WordPiece segmentation of a
    distinct-word frame. ``vocab`` is a sequence of piece strings
    where continuation pieces carry the ``##`` prefix. Adds
    (pieces array<string>, n_pieces, is_unk): a word with no matching
    piece at some position — or longer than ``max_word_len``, the
    BERT very-long-word rule — becomes the single ``unk`` piece.

    The greedy scan is one ``aggregate`` fold; each step resolves the
    longest match with a coalesce over descending literal lengths (K
    literal-map probes), consuming >= 1 char, so ``max_word_len``
    steps always finish. Exact string semantics, no scores — the
    published WordPiece INFERENCE rule (the training side is BPE-like
    likelihood election; bpe_train covers that family).

    Same two-engine model-size dial as ``unigram_viterbi``: the
    literal-map fold at or below ``fold_max_pieces`` vocabulary
    entries, the Arrow-batched mapInPandas twin
    (tokenizer_arrow.wordpiece_segment_arrow) above it — bit-
    identical, plan size independent of the vocabulary."""
    vlist = [str(v) for v in vocab]
    if len(set(vlist)) != len(vlist) or not vlist:
        raise ValueError("WordPiece vocab must be non-empty and "
                         "duplicate-free")
    for v in vlist:
        # per-entry stem validation (r10 advice): a stemless piece —
        # '' or the bare '##' continuation prefix — can never match
        # any position (every probe consumes >= 1 stem char), so it
        # is a vocab bug; reject it rather than carry it silently
        stem = v[len(WP_CONT):] if v.startswith(WP_CONT) else v
        if not stem:
            raise ValueError(
                f"WordPiece vocab piece {v!r} has an empty stem")
    if engine == "auto":
        engine = "fold" if len(vlist) <= fold_max_pieces else "arrow"
    if engine == "arrow":
        from .tokenizer_arrow import wordpiece_segment_arrow
        return wordpiece_segment_arrow(
            words, vlist, word_col=word_col, unk=unk,
            max_word_len=max_word_len, cont=WP_CONT)
    if engine != "fold":
        raise ValueError(f"unknown engine {engine!r}")
    vmap = _lit_map([(v, 1) for v in vlist])
    K = max(len(v) - len(WP_CONT) if v.startswith(WP_CONT) else len(v)
            for v in vlist)
    w = F.col(word_col)
    n = F.length(w)
    init = F.struct(
        F.lit(0).cast("long").alias("pos"),
        F.array().cast("array<string>").alias("ps"),
        F.lit(False).alias("fail"))

    def key_l(pos, l):
        sub = F.substring(w, pos + 1, F.lit(l))
        return F.when(pos == 0, sub).otherwise(F.concat(F.lit(WP_CONT),
                                                        sub))

    def step(acc, _):
        pos = acc["pos"]
        probes = []
        for l in range(K, 0, -1):
            k = key_l(pos, l)
            hit = (pos + l <= n) & F.element_at(vmap, k).isNotNull()
            # a raw '##'-prefixed substring at pos 0 must not match a
            # continuation piece — guard mirrored in the oracle
            hit = hit & ((pos > 0) | ~F.substring(w, pos + 1, F.lit(l))
                         .startswith(WP_CONT))
            probes.append(F.when(hit, F.lit(l)))
        best_l = F.coalesce(*probes, F.lit(None).cast("int"))
        advanced = F.struct(
            (pos + best_l).cast("long").alias("pos"),
            F.concat(acc["ps"], F.array(key_l(pos, best_l))).alias("ps"),
            F.lit(False).alias("fail"))
        failed = F.struct(pos.alias("pos"), acc["ps"].alias("ps"),
                          F.lit(True).alias("fail"))
        return (F.when(acc["fail"] | (pos >= n), acc)
                 .otherwise(F.when(best_l.isNull(), failed)
                             .otherwise(advanced)))

    fin = F.aggregate(F.sequence(F.lit(1), F.lit(max_word_len)), init,
                      step)
    # w.isNull() first: pins NULL word -> unk, matching the Arrow
    # kernel's `w or ''` fallback (r11 ADVICE — the fold otherwise
    # emitted NULL pieces on caller-supplied word frames)
    bad = (w.isNull() | fin["fail"] | (n > max_word_len) | (n == 0)
           | (fin["pos"] < n))
    out = words.select(
        "*",
        F.when(bad, F.array(F.lit(unk))).otherwise(fin["ps"])
         .alias("pieces"),
        F.when(bad, F.lit(1).cast("long"))
         .otherwise(F.size(fin["ps"]).cast("long")).alias("n_pieces"),
        bad.alias("is_unk"))
    # same Generate-collapse barrier as unigram_viterbi's (an explode
    # of `pieces` must not re-run the greedy fold per element)
    return out.localCheckpoint(eager=False)


def wordpiece_encode(df: DataFrame, vocab, text_col: str = "text",
                     id_col: str = "doc_id", unk: str = WP_UNK,
                     max_word_len: int = 24,
                     engine: str = "auto") -> DataFrame:
    """Encode a corpus with a WordPiece vocabulary — per document
    (id, n_words, n_pieces, n_unk_words). Same three-stage scale
    shape as bpe_encode / unigram_encode: one corpus tokenize into
    (doc, word) counts, vocab-sized segmentation, one join + agg."""
    wc = _word_counts(df, text_col, id_col)
    seg = wordpiece_segment(
        wc.select("word").distinct(), vocab, unk=unk,
        max_word_len=max_word_len, engine=engine,
    ).select("word", "n_pieces", "is_unk")
    return (wc.join(seg, "word")
            .groupBy(id_col)
            .agg(F.sum("_c").cast("long").alias("n_words"),
                 F.sum(F.col("_c") * F.col("n_pieces")).cast("long")
                  .alias("n_pieces"),
                 F.sum(F.when(F.col("is_unk"), F.col("_c"))
                        .otherwise(F.lit(0))).cast("long")
                  .alias("n_unk_words")))
