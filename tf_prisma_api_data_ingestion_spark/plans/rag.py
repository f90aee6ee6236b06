"""RAG context assembly — retrieve-then-diversify over the document
corpus (north-star extension; no reference analog — SURVEY.md §7.5).

The serving-side composite of the retrieval stack: a batch of query
documents is scored against the candidate corpus with the log-free BM25
family (operators/text.py bm25_topk's scoring, generalized from a fixed
term list to a query-term JOIN), the per-query top candidates are then
de-duplicated by token-set Jaccard so the assembled context window isn't
three copies of the same boilerplate, and the first k survivors per
query ship as the context set.

Determinism: per-term BM25 weights are fixed double chains scaled to
exact BIGINT micros BEFORE the cross-term sum (stronger than the
bm25_topk precedent — the candidate ranking is an exact integer order,
no float-sum ambiguity); the diversity test (den+num)*inter >
num*(|A|+|B|) is the Jaccard > num/den comparison cleared of division
entirely. The whole plan replays hash-identical in DuckDB.

Scale design: query terms are a broadcast (a context-assembly batch is
small — hundreds of queries x hundreds of distinct terms); the corpus
side is ONE token explode filtered by the broadcast term set before any
shuffle (semi-join pruning, same shape as benchmark decontamination);
per-term df is a tiny broadcast-back frame. The pairwise Jaccard runs
only within each query's top-2k shortlist — k^2 pairs per query, never
corpus-quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..cache import tracked_persist
from ..operators.text import tokens


def rag_contexts(docs: DataFrame, n_queries: int = 5, k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text",
                 k1: float = 1.2, b: float = 0.75,
                 jac_num: int = 4, jac_den: int = 5) -> DataFrame:
    """Returns (query_id, rank, doc_id, score_r): the k diverse top-BM25
    candidate docs per query doc (the ``n_queries`` smallest ids form
    the query batch; candidates are the rest of the corpus).

    A candidate is dropped when its token-set Jaccard with a
    HIGHER-RANKED shortlist member exceeds jac_num/jac_den (default
    4/5) — the rank-greedy diversity rule, expressed as a NOT-EXISTS
    over shortlist pairs with the division-free integer comparison
    (den+num)*inter > num*(|A|+|B|), so both engines agree exactly.
    """
    ts = tokens(F.col(text_col))
    # persist the tokenized corpus: base feeds the query batch, the
    # candidate anti-join/stats/hits, AND the shortlist token lookup —
    # without the barrier each consumer re-runs the tokenize regex over
    # the whole corpus (the r14 before-plan scanned documents 29 times;
    # guide §5: reuse + recompute cost justify the cache)
    base = tracked_persist(
        docs.select(F.col(id_col).alias("doc_id"), ts.alias("_ts"),
                    F.size(ts).alias("_dl")))
    qids = (base.orderBy("doc_id").limit(n_queries)
                .select(F.col("doc_id").alias("query_id"), "_ts"))
    qterms = (qids.select("query_id",
                          F.explode(F.array_distinct("_ts")).alias("_t")))
    cand = base.join(F.broadcast(qids.select("query_id")),
                     F.col("doc_id") == F.col("query_id"), "left_anti")

    stats = cand.agg(F.count(F.lit(1)).alias("_n"),
                     F.sum("_dl").alias("_sumdl"))
    # one corpus explode, pruned by the broadcast query vocabulary
    # BEFORE the tf shuffle; tf is per (candidate, term), the qid join
    # fans each hit out only to the queries that asked for the term
    hits = (cand.select("doc_id", "_dl", F.explode("_ts").alias("_t"))
                .join(F.broadcast(qterms.select("_t").distinct()), "_t")
                .groupBy("doc_id", "_dl", "_t")
                .agg(F.count(F.lit(1)).alias("_tf")))
    dfreq = hits.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    scored = (hits.join(F.broadcast(dfreq), "_t")
                  .join(F.broadcast(qterms), "_t")
                  .crossJoin(F.broadcast(stats)))
    avgdl = F.col("_sumdl").cast("double") / F.col("_n").cast("double")
    idf = ((F.col("_n").cast("double") - F.col("_df").cast("double") + 0.5)
           / (F.col("_df").cast("double") + 0.5))
    tf = F.col("_tf").cast("double")
    sat = (tf * (k1 + 1.0)
           / (tf + k1 * (1.0 - b + b * F.col("_dl").cast("double") / avgdl)))
    w_micro = F.expr(
        "CAST(round(({w}) * 1000000.0) AS BIGINT)".format(w="_w"))
    per_term = scored.withColumn("_w", idf * sat).withColumn("_wm", w_micro)
    # micros widen to DECIMAL(38,0) before the sum: the odds-ratio idf
    # grows with corpus size (~4N at df=0.5), so per-term micros reach
    # ~4e18 at 1e12 docs and a LONG sum would overflow on the first
    # multi-term doc (DuckDB's SUM auto-promotes to HUGEINT)
    qc = (per_term.groupBy("query_id", "doc_id")
                  .agg(F.sum(F.col("_wm").cast("decimal(38,0)"))
                        .alias("_sm")))

    # shortlist: top-2k per query by the EXACT integer score
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("_sm").desc(), F.col("doc_id").asc())
    short = (qc.withColumn("_r0", F.row_number().over(w_rank))
               .filter(F.col("_r0") <= 2 * k))

    # distinct-token inventories of shortlist members only
    toks = (short.select("query_id", "doc_id", "_r0")
                 .join(base.select("doc_id",
                                   F.array_distinct("_ts").alias("_set"),
                                   F.size(F.array_distinct("_ts"))
                                    .alias("_nt")),
                       "doc_id"))
    lo = toks.select("query_id", F.col("doc_id").alias("a_id"),
                     F.col("_r0").alias("a_r"), F.col("_set").alias("a_set"),
                     F.col("_nt").alias("a_nt"))
    hi = toks.select("query_id", F.col("doc_id").alias("b_id"),
                     F.col("_r0").alias("b_r"), F.col("_set").alias("b_set"),
                     F.col("_nt").alias("b_nt"))
    pairs = (lo.join(hi, "query_id")
               .filter(F.col("a_r") < F.col("b_r"))
               .withColumn("_i", F.size(F.array_intersect("a_set", "b_set")))
               .filter((jac_den + jac_num) * F.col("_i")
                       > jac_num * (F.col("a_nt") + F.col("b_nt")))
               .select("query_id", F.col("b_id").alias("doc_id"))
               .distinct())
    survivors = short.join(pairs, ["query_id", "doc_id"], "left_anti")
    w_final = Window.partitionBy("query_id").orderBy(
        F.col("_sm").desc(), F.col("doc_id").asc())
    return (survivors.withColumn("rank", F.row_number().over(w_final))
                     .filter(F.col("rank") <= k)
                     .select("query_id", F.col("rank").cast("long")
                              .alias("rank"), "doc_id",
                             (F.col("_sm").cast("double")
                              / F.lit(1000000.0)).alias("score_r"))
                     .orderBy("query_id", "rank"))


def hybrid_retrieval(docs: DataFrame, embeddings: DataFrame,
                     terms: list[str], query_vec_id: int = 0,
                     k: int = 10, top_n: int = 5) -> DataFrame:
    """Hybrid lexical+semantic retrieval — the production RAG retriever
    shape: BM25 top-k over the text corpus and exact-cosine top-k
    against a query embedding, fused by reciprocal-rank fusion
    (operators/ml.RRF_SCORE_MICRO, k0=60 literal table). The point of
    RRF is exactly this composition: the two score scales (odds-ratio
    BM25 vs cosine) are incomparable, their RANKS are not.

    Scale design: each ranker keeps its own optimal plan (BM25 =
    semi-join-pruned explode + broadcast df frame + TakeOrdered; cosine
    = broadcast single query over a shuffle-free candidate scan); the
    fusion then joins two k-row frames — the expensive sides never meet
    in a shuffle. Ranks inside each k-row list order by the ROUNDED
    output score with id tie-break (the rounding both engines agree
    on), so fusion is exact integer arithmetic on deterministic ranks.

    Returns the fused top-``top_n``: (doc_id, rank_lex, rank_sem,
    rrf_micro, fused_rank); rank_lex/rank_sem NULL when the document
    appears in only one ranker's top-k.
    """
    from ..operators.ml import RRF_SCORE_MICRO
    from ..operators.similarity import brute_force_topk
    from ..operators.text import bm25_topk
    if not 1 <= k <= len(RRF_SCORE_MICRO):
        raise ValueError(f"k must be in 1..{len(RRF_SCORE_MICRO)}")
    lex0 = bm25_topk(docs, list(terms), k=k)
    wl = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    lex = lex0.select("doc_id", F.row_number().over(wl).alias("rank_lex"))
    sem0 = brute_force_topk(
        embeddings.filter(F.col("vec_id") == query_vec_id),
        embeddings, k=k)
    ws = Window.orderBy(F.col("cos_r").desc(), F.col("vec_id").asc())
    sem = sem0.select(F.col("vec_id").alias("doc_id"),
                      F.row_number().over(ws).alias("rank_sem"))
    tab = F.array(*[F.lit(x) for x in RRF_SCORE_MICRO[:k]])
    fused = lex.join(sem, "doc_id", "full_outer")
    # NULL ranks short-circuit BEFORE element_at (the Spark 4.1
    # foldable-array NULL-index quirk — see operators/ml.mrr_at_k)
    sc = (F.when(F.col("rank_lex").isNotNull(),
                 F.element_at(tab, F.col("rank_lex"))).otherwise(0)
          + F.when(F.col("rank_sem").isNotNull(),
                   F.element_at(tab, F.col("rank_sem"))).otherwise(0))
    wf = Window.orderBy(F.col("rrf_micro").desc(), F.col("doc_id").asc())
    return (fused.withColumn("rrf_micro", sc.cast("long"))
                 .withColumn("fused_rank",
                             F.row_number().over(wf).cast("long"))
                 .filter(F.col("fused_rank") <= top_n)
                 .select("doc_id",
                         F.col("rank_lex").cast("long").alias("rank_lex"),
                         F.col("rank_sem").cast("long").alias("rank_sem"),
                         "rrf_micro", "fused_rank"))
