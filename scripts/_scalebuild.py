"""Shared builders for the copy-scaled /tmp datasets used by
scale10.py / scale100.py / scale100_docs.py.

Documents construction (round-5 fix): copy i rewrites every document by
the token bijection "content word w -> w || 'c<i>'" — an ALPHANUMERIC
suffix the ``[^a-z0-9]`` normalizer keeps inside the token — while
stopwords map to themselves. Properties, each load-bearing for honest
scale measurement:

- within-copy similarity is preserved EXACTLY (a token bijection is a
  shingle bijection, so every pair's jaccard is unchanged) — true
  near-dup pairs grow linearly with copies;
- cross-copy shingle overlap is destroyed (every shingle containing a
  content word is copy-unique; the only shared shingles are the rare
  all-stopword n-grams, a vanishing sum-df^2 term);
- per-copy shingle document-frequency statistics equal the source
  corpus's, so the inverted-index join volume (sum over shingles of
  df^2) grows LINEARLY in copies;
- quality_score / n_tokens / dup_frac are preserved EXACTLY (stopword
  hits, token counts and trigram-repetition structure are all invariant
  under the class-preserving bijection), so quality-gated composites
  process the same fraction of the corpus at every scale.

Two earlier constructions failed, in instructive ways, both measured:
suffixing EVERY token with ``_c<i>`` let the normalizer split the suffix
into its own hot token (sum df^2 went QUADRATIC — 51 billion join rows
at 100x) and zeroed every quality score (suffixed stopwords stop being
stopwords), so the composite sf1 rows were timing an empty pipeline;
per-copy vocabulary PERMUTATION kept quality exact but maps every copy
into the SAME tiny trigram space (31-word vocab), so cross-copy df added
up and sum df^2 went super-linear again (83x for 10 copies).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

STOP_FIXED = {"the", "a"}  # vocab ∩ STOPWORDS: kept verbatim in every copy


def replicate_documents(src_parquet: str, out_parquet: str,
                        copies: int) -> None:
    """Write documents x ``copies`` with the per-copy content-suffix bijection."""
    t = pq.read_table(src_parquet)
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()

    vocab = sorted({w for s in texts for w in s.split(" ") if w})
    content = [w for w in vocab if w not in STOP_FIXED]

    out_id, out_text, out_lang, out_src, out_n = [], [], [], [], []
    for i in range(copies):
        mapping = {w: f"{w}c{i}" for w in content}
        for did, txt, lg, sc in zip(doc_ids, texts, langs, sources):
            new = " ".join(mapping.get(w, w) for w in txt.split(" "))
            out_id.append(did + i * 100_000_000)
            out_text.append(new)
            out_lang.append(lg)
            out_src.append(sc)
            out_n.append(len(new))
    pq.write_table(pa.table({
        "doc_id": pa.array(out_id, pa.int64()),
        "text": pa.array(out_text, pa.string()),
        "lang": pa.array(out_lang, pa.string()),
        "source": pa.array(out_src, pa.string()),
        "n_chars": pa.array(out_n, pa.int64()),
        # bounded row groups: a single 500k-row group is indivisible to
        # Spark's byte-range splitter, so every scan of the built file
        # would serialize onto ONE core (measured: the sf10 straggler)
    }), out_parquet, row_group_size=20_000)


def replicate_events(src_parquet: str, out_parquet: str, copies: int) -> None:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{src_parquet}'")
    con.execute(f"""
        COPY (SELECT * REPLACE (event_id + i * 1000000000 AS event_id,
                                user_id + i * 10000000 AS user_id)
              FROM events CROSS JOIN range({copies}) t(i))
        TO '{out_parquet}' (FORMAT PARQUET)""")


def replicate_lineitem(src_parquet: str, out_parquet: str,
                       copies: int) -> None:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{src_parquet}'")
    con.execute(f"""
        COPY (SELECT * REPLACE (l_orderkey + i * 1000000000 AS l_orderkey)
              FROM lineitem CROSS JOIN range({copies}) t(i))
        TO '{out_parquet}' (FORMAT PARQUET)""")
