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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

END_MARK = "</w>"


def word_syms(word: Column, basis: str = "chars") -> Column:
    """A word's initial BPE symbol array (without the ``</w>``
    terminator) under the chosen alphabet basis. Every stage past v0
    — pair counts, elections, merge folds, the Arrow apply kernel —
    is alphabet-agnostic, so the basis is purely a v0 construction
    dial:

    - ``chars``: single characters (Sennrich et al. 2016's original
      formulation; the Java-regex '.' split both engines and the
      oracle share).
    - ``bytes``: UTF-8 bytes as lowercase hex pairs — a byte-level
      alphabet in the GPT-2 spirit: no character ever falls outside
      the 256-symbol base alphabet, so there is no <unk> at the
      symbol level and multi-byte scripts merge back together from
      bytes. NOT wire-compatible with actual GPT-2/LLaMA artifacts
      (those remap bytes to printable unicode and carry no
      end-of-word marker; this symbol encoding is hex-pair internal
      plus the Sennrich ``</w>`` terminator — real GPT-2 merge
      tables will not load). hex(encode(word)) is bit-identical
      between Spark and DuckDB (both uppercase; lowered on both
      sides), so the oracle replay carries over unchanged.
    """
    if basis == "chars":
        return F.regexp_extract_all(word, F.lit("."), 0)
    if basis == "bytes":
        return F.regexp_extract_all(
            F.lower(F.hex(F.encode(word, "UTF-8"))), F.lit(".."), 0)
    raise ValueError(f"unknown basis {basis!r}")


# The GPT-2 pre-tokenizer (Radford et al. 2019; the regex published in
# openai/gpt-2 encoder.py and reused by RoBERTa/LLaMA-family BPEs),
# transcribed to Java regex with TWO pinned dials so both engines and
# the oracle agree byte-for-byte:
#   - whitespace is the EXPLICIT Java \s class [ \t\n\x0B\f\r]
#     (canonical GPT-2 uses Python's unicode \s; Java \s is ASCII and
#     RE2's \s lacks \x0B, so the explicit class is the only spelling
#     all three engines share — the repo's tokens() ASCII-whitespace
#     rule),
#   - letters/digits are the unicode \p{L} / \p{N} categories, which
#     Java and RE2 agree on.
# Alternation order is semantic (leftmost-first): contractions, then
# optionally-space-prefixed letter/digit/other runs, then the
# trailing-whitespace lookahead split that donates a run's last space
# to the following token. Matches partition the string: every char is
# some alternative's first char.
_GPT2_WS = " \\t\\n\\x0B\\f\\r"
GPT2_PRETOK_RE = (
    "'s|'t|'re|'ve|'m|'ll|'d"
    "| ?\\p{L}+| ?\\p{N}+"
    "| ?[^" + _GPT2_WS + "\\p{L}\\p{N}]+"
    "|[" + _GPT2_WS + "]+(?![^" + _GPT2_WS + "])"
    "|[" + _GPT2_WS + "]+")


def gpt2_pieces(col: Column) -> Column:
    """GPT-2 pre-tokenizer pieces of the raw text, in order — the
    contraction/category regex split applied BEFORE the byte-level v0
    (``word_syms(basis="bytes")``), so punctuation-adjacent text
    segments the way the canonical byte-level BPE family does
    ("dog's," -> ["dog", "'s", ","]) instead of the whitespace split's
    ["dog's,"]. Unlike ``text.tokens`` this neither lowercases nor
    trims: case and the leading-space convention (a piece keeps the
    single space that precedes it) are part of the GPT-2 contract.
    One ``regexp_extract_all`` — sequential leftmost-first matching IS
    the tokenizer, entirely JVM-side. The DuckDB twin replays the
    partition as a per-character boundary predicate (RE2 has no
    lookahead), proven equal on the engines' shared semantics by the
    three-way parity tests (tests/test_round14.py)."""
    return F.regexp_extract_all(col, F.lit(GPT2_PRETOK_RE), 0)


def pretok_pieces(col: Column, pretok: str = "words") -> Column:
    """The pre-tokenizer dial shared by the BPE trainer and encoder:
    ``words`` — lowercased whitespace tokens (``text.tokens``, the
    repo's standard split); ``gpt2`` — ``gpt2_pieces``."""
    if pretok == "words":
        return tokens(col)
    if pretok == "gpt2":
        return gpt2_pieces(col)
    raise ValueError(f"unknown pretok {pretok!r}")


def bpe_init_vocab(df: DataFrame, text_col: str = "text",
                   basis: str = "chars",
                   pretok: str = "words") -> DataFrame:
    """Corpus -> initial BPE vocab: one row per distinct word with its
    corpus frequency and the word split into base symbols (``basis``:
    single characters, or UTF-8 bytes as hex pairs — ``word_syms``)
    plus the terminal ``</w>`` marker. ``pretok`` picks the
    pre-tokenizer producing the word stream (``pretok_pieces``). The
    ONLY corpus-sized stage of BPE training (one shuffle on the word
    key, partial counts map-side)."""
    w = df.select(F.explode(pretok_pieces(F.col(text_col),
                                          pretok)).alias("word"))
    syms = word_syms(F.col("word"), basis)
    return (w.groupBy("word")
             .agg(F.count(F.lit(1)).cast("long").alias("freq"))
             .withColumn("syms",
                         F.concat(syms, F.array(F.lit(END_MARK)))))


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


def merge_fold(syms: Column, a: Column, b: Column) -> Column:
    """Greedy left-to-right non-overlapping replacement of adjacent
    (``a``, ``b``) with the concatenated symbol, as a single
    ``aggregate`` fold over the symbol array — pure map-side, no UDF.

    The fold IS the greedy scan: a freshly merged symbol becomes the
    accumulator's tail as ``a||b``, which can never equal ``a`` again
    (``b`` is non-empty), so overlapping candidates — e.g. 'x x x'
    under ('x','x') -> ['xx','x'] — resolve exactly as the paper's
    left-to-right pass does."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.get(acc, F.size(acc) - 1) == a) & (x == b),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(F.concat(a, b))),
        ).otherwise(F.concat(acc, F.array(x))))


def bpe_apply_merge(vocab: DataFrame, elected: DataFrame) -> DataFrame:
    """Apply one elected merge to every vocab word (``merge_fold`` with
    the broadcast 1-row winner's pair columns)."""
    merged = merge_fold(F.col("syms"), F.col("left_sym"),
                        F.col("right_sym"))
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
              text_col: str = "text",
              basis: str = "chars",
              pretok: str = "words") -> DataFrame:
    """N-round BPE training loop; returns the learned merge TABLE —
    (merge_rank, left_sym, right_sym, pair_count) — the artifact a
    tokenizer consumes. The vocab state is localCheckpointed each round
    (it is distinct-words-sized, not corpus-sized) so lineage stays
    flat; the corpus is scanned exactly once, by ``bpe_init_vocab``."""
    vocab = bpe_init_vocab(df, text_col, basis=basis,
                           pretok=pretok).localCheckpoint(eager=False)
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


# Above this many merge ranks the fold engine's PLAN (R stacked
# aggregate projections) stops being the right shape — analysis and
# codegen cost grow with the model — and the Arrow engine takes over.
# At or below it, the fold keeps the zero-Python, oracle-replayable
# plan. Both engines are bit-identical (tests/test_tokenizer_arrow.py).
FOLD_MAX_MERGES = 64


def merge_pairs(merges) -> list[tuple[str, str]]:
    """Normalize a merge table to a driver-side rank-ordered pair
    list: either the DataFrame ``bpe_train`` returns (collected here
    sorted by merge_rank — the model-sized driver traffic every
    trained-artifact consumer in this repo pays: probe weights,
    k-means centroids) or an already-driver-side sequence."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("merge_rank").collect()
        return [(r["left_sym"], r["right_sym"]) for r in rows]
    return [(str(a), str(b)) for a, b in merges]


def bpe_elect_batch(pair_counts: DataFrame,
                    m: int) -> list[tuple[str, str, int]]:
    """Greedy top-``m`` PAIRWISE SYMBOL-DISJOINT election under the
    pinned total order (pair_count DESC, left ASC, right ASC): walk
    the ordered pairs and keep each one whose symbols do not appear
    in any already-kept pair — the SentencePiece / YouTokenToMe
    batched-election rule. The safety condition is that applying a
    kept pair cannot change any other kept pair's count, so the batch
    equals ``m`` consecutive sequential elections whenever no
    conflict (and no stronger newly-created pair) intervenes — the
    property op-bpe-batch-elect's unrolled oracle and
    tests/test_bpe_batch.py pin. Plain symbol-disjointness is NOT
    sufficient for it (r11 ADVICE): kept ``('a','b')`` and candidate
    ``('ab','c')`` share no symbol, yet merging ``('a','b')`` creates
    new ``'ab'`` symbols that change ``('ab','c')``'s count. So a
    candidate is also rejected when either of its symbols equals an
    already-kept pair's CONCATENATION, or when its own concatenation
    equals an already-kept pair's symbol (merging it would mint
    symbols that feed a kept pair's count from the other side).

    Driver traffic is model-sized: a top-k slice of the ordered
    frame is fetched (distributed TakeOrdered, no full sort) and the
    greedy filter runs in Python, re-fetching a doubled slice in the
    rare case the kept set exhausts it."""
    if m < 1:
        raise ValueError(f"batch size must be >= 1, got {m}")
    ordered = pair_counts.orderBy(
        F.col("pair_count").desc(), F.col("left_sym").asc(),
        F.col("right_sym").asc())
    fetch = max(4 * m, 16)
    while True:
        rows = ordered.limit(fetch).collect()
        picked: list[tuple[str, str, int]] = []
        used: set[str] = set()
        made: set[str] = set()  # concatenations a||b of kept pairs
        for r in rows:
            a, b = r["left_sym"], r["right_sym"]
            if a in used or b in used:
                continue
            # concatenation-collision guard (see docstring): a kept
            # merge mints its a||b symbol, so a candidate touching a
            # kept concatenation — or minting a kept symbol — would
            # have some kept pair's count change mid-batch
            if a in made or b in made or (a + b) in used:
                continue
            picked.append((a, b, int(r["pair_count"])))
            used.add(a)
            used.add(b)
            made.add(a + b)
            if len(picked) == m:
                return picked
        if len(rows) < fetch:
            # the ordered frame is exhausted — fewer than m disjoint
            # pairs exist; truncation is the caller-visible signal
            return picked
        fetch *= 2


def bpe_train_batched(df: DataFrame, n_merges: int = 8,
                      batch_m: int = 4, text_col: str = "text",
                      engine: str = "auto",
                      basis: str = "chars",
                      pretok: str = "words") -> DataFrame:
    """BPE training with BATCHED elections: each round elects the top
    ``batch_m`` pairwise symbol-disjoint pairs from one pair count
    and applies them in one fold/Arrow pass — collapsing the driver
    loop's round count (and its per-round job floor) ~``batch_m``x
    versus ``bpe_train``'s one-merge-per-round chain. This is the
    standard production BPE-trainer speedup (SentencePiece /
    YouTokenToMe): a 30k-merge vocabulary becomes ~30k/M rounds
    instead of ~60k driver-loop jobs.

    Semantics: ``batch_m=1`` is exactly ``bpe_train`` (pinned by
    test). For larger batches the result equals the sequential chain
    whenever the kept pairs pass ``bpe_elect_batch``'s disjointness +
    concatenation-collision guard and no mid-batch merge creates a
    pair outranking the batch's remainder — the documented
    approximation, exact on natural-language pair distributions'
    heavy tail and verified against the unrolled sequential trainer
    on the gate corpus. Returns the same
    (merge_rank, left_sym, right_sym, pair_count) artifact, ranks
    numbered in election order across batches."""
    vocab = bpe_init_vocab(df, text_col, basis=basis,
                           pretok=pretok).localCheckpoint(eager=False)
    spark = df.sparkSession
    schema = ("merge_rank long, left_sym string, right_sym string,"
              " pair_count long")
    # The TRAINER's auto dial resolves to the ARROW apply engine
    # regardless of batch size (r12, the opposite of the encoder's
    # dial, deliberately): every round applies a FRESH pair batch, so
    # the fold plan is re-analyzed per round and its compile cost
    # never amortizes — and a batch_m=64 fold chain is 64 nested
    # higher-order aggregates, which Spark evaluates INTERPRETED
    # (HOFs don't codegen). Measured on the r12 Zipf fixture (60k
    # distinct words): 42.9s/round-batch with the fold apply vs
    # 2.5s/round-batch with the Arrow apply. engine='fold' stays
    # available for the zero-Python, oracle-replayable per-round
    # plan; both engines are bit-identical
    # (tests/test_tokenizer_arrow.py).
    apply_engine = "arrow" if engine == "auto" else engine
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        want = min(batch_m, n_merges - len(merges))
        batch = bpe_elect_batch(bpe_pair_counts(vocab), want)
        if not batch:
            # no adjacent pair left (every word fully fused) — stop
            # with a truncated table, like bpe_train
            break
        for a, b, c in batch:
            merges.append((len(merges) + 1, a, b, c))
        vocab = bpe_apply_merges(
            vocab, [(a, b) for a, b, _ in batch],
            engine=apply_engine).localCheckpoint(eager=False)
    return spark.createDataFrame(merges, schema)


def bpe_apply_merges(words: DataFrame, merges,
                     syms_col: str = "syms", engine: str = "auto",
                     fold_max_merges: int = FOLD_MAX_MERGES
                     ) -> DataFrame:
    """Apply a LEARNED merge table to a word frame's symbol arrays, in
    rank order — the encoder half of BPE (Sennrich et al. 2016 §3:
    "we apply the learned operations" greedily in learned order).

    Two bit-identical engines behind a model-size dial (the
    auto_planes / dedup_clusters_auto idiom):

    - ``fold`` (at or below ``fold_max_merges`` ranks): each merge is
      one literal ``merge_fold`` projection; R merges chain R folds
      inside one codegen'd projection — all map-side, zero shuffles,
      zero Python, replayable in the DuckDB oracle. The PLAN grows
      with the model, which is fine only while the model is small.
    - ``arrow`` (above): one Arrow-batched ``mapInPandas`` whose
      closure carries the merge table as a dict
      (tokenizer_arrow.bpe_apply_merges_arrow) — the plan is one
      ArrowEvalPython node regardless of vocabulary size; the
      production path for real 30k-rank tables.
    """
    pairs = merge_pairs(merges)
    if engine == "auto":
        engine = "fold" if len(pairs) <= fold_max_merges else "arrow"
    if engine == "arrow":
        from .tokenizer_arrow import bpe_apply_merges_arrow
        return bpe_apply_merges_arrow(words, pairs, syms_col=syms_col)
    if engine != "fold":
        raise ValueError(f"unknown engine {engine!r}")
    out = words
    for a, b in pairs:
        out = out.withColumn(
            syms_col, merge_fold(F.col(syms_col), F.lit(a), F.lit(b)))
    return out


def bpe_encode(df: DataFrame, merges, text_col: str = "text",
               id_col: str = "doc_id", engine: str = "auto",
               basis: str = "chars", pretok: str = "words") -> DataFrame:
    """Encode a corpus with a learned BPE merge table — the real
    token-counting basis that replaces the ``bpe_ish_piece_count``
    heuristic proxy (the consumer of ``bpe_train``'s artifact).

    Scale shape: the corpus is tokenized ONCE into per-(doc, word)
    counts (one map-side-combinable shuffle); the merge chain runs
    over the DISTINCT-WORD frame only (Zipf: segmentation work is
    vocab-sized, not corpus-sized — the same reason bpe_train's
    rounds are cheap); per-doc totals come from one hash join on the
    compact word key plus one aggregation. No UDFs, no windows.

    Returns (id, n_words, n_pieces, ppw_ppm) per document with >= 1
    token, where ppw_ppm is half-up pieces-per-word in ppm.
    """
    # localCheckpoint makes "tokenized ONCE" true in the EXECUTED plan:
    # without it, the distinct-word branch prunes doc_id into its own
    # scan (no exchange reuse) and the corpus tokenizes twice — the
    # checkpointed (doc, word, count) frame feeds both the
    # segmentation and the final join instead (measured 25.6s -> 7.5s
    # at the 500k-doc decade, SCALING.md r11b)
    wc = (df.select(F.col(id_col),
                    F.explode(pretok_pieces(F.col(text_col),
                                            pretok)).alias("word"))
          .groupBy(id_col, "word")
          .agg(F.count(F.lit(1)).alias("_c"))
          .localCheckpoint(eager=False))
    syms = word_syms(F.col("word"), basis)
    seg = (wc.select("word").distinct()
           .withColumn("syms",
                       F.concat(syms, F.array(F.lit(END_MARK)))))
    seg = bpe_apply_merges(seg, merges, engine=engine).select(
        "word", F.size("syms").alias("_np"))
    return (wc.join(seg, "word")
            .groupBy(id_col)
            .agg(F.sum("_c").cast("long").alias("n_words"),
                 F.sum(F.col("_c") * F.col("_np")).cast("long")
                  .alias("n_pieces"))
            .withColumn("ppw_ppm", F.expr(
                "(2 * n_pieces * 1000000 + n_words) DIV (2 * n_words)")
                .cast("long")))
