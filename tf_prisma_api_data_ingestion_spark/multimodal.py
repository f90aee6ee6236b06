"""Multimodal column handling: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas`` (SURVEY builder-brief item;
no reference analog).

The pattern at 100 TB: media lives as a ``binary`` column (or object-store
pointer) beside typed metadata; decode / feature-extraction runs inside
``mapInPandas`` so each Arrow batch crosses the JVM<->Python boundary
once, and the work distributes per-partition. Image/audio codecs are not
installed in this environment, so ``decode_image`` is an explicit
NotImplementedError stub and the pipelines use ``fake_decode_features`` —
a deterministic stand-in with the same schema/batch shape, keeping all the
Spark-side plumbing real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KIND = "image/fake"


def with_binary_payload(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Attach an opaque binary payload + media-metadata struct.

    Here the payload is the utf-8 encoded document (a deterministic
    carrier); in production it is the actual image/audio bytes ingested
    from the object store.
    """
    from .parallel import fan_out
    # fan_out first: the downstream mapInPandas stages inherit the scan's
    # partitioning, and a few-row-group corpus file would serialize every
    # Arrow batch onto one core (a parquet row group is indivisible to
    # the byte splitter)
    return fan_out(df).select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(F.lit(MEDIA_KIND).alias("kind")).alias("media"))


def decode_image(payload: bytes) -> object:
    """Real decode hook — requires an image codec (PIL/cv2), which is not
    installed in this environment. The pipelines call
    ``fake_decode_features`` instead; swap this in when codecs exist."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use fake_decode_features for the deterministic stand-in")


def fake_decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-payload 'decoded' features via mapInPandas (Arrow batches).

    Deterministic stand-in for decode+measure: width/height derived from
    the byte length. Schema, batching, and partitioning are exactly what a
    real decoder would use.
    """
    schema = f"{id_col} LONG, n_bytes LONG, width INT, height INT"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_bytes": n,
                "width": (n % 640).astype("int32"),
                "height": ((n * 7) % 480).astype("int32"),
            })

    return df.select(id_col, "payload").mapInPandas(decode, schema)


def fake_frame_sample(df: DataFrame, id_col: str = "doc_id",
                      step: int = 7) -> DataFrame:
    """Frame sampling for 'video' payloads via mapInPandas: emits one row
    per sampled frame index (0, step, 2*step, ...), with the fake frame
    count derived deterministically from the byte length (n_bytes%30+1).

    Output cardinality differs from input — the mapInPandas contract
    (unlike a scalar pandas_udf) allows that, which is why it is the right
    tool for decode-and-explode stages.
    """
    schema = f"{id_col} LONG, frame_idx INT, n_frames INT"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, totals = [], [], []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                n_frames = len(payload) % 30 + 1
                for f_idx in range(0, n_frames, step):
                    ids.append(i)
                    frames.append(f_idx)
                    totals.append(n_frames)
            yield pd.DataFrame({id_col: pd.array(ids, dtype="int64"),
                                "frame_idx": pd.array(frames, dtype="int32"),
                                "n_frames": pd.array(totals, dtype="int32")})

    return df.select(id_col, "payload").mapInPandas(sample, schema)


def fake_resize(df: DataFrame, target_w: int = 64, target_h: int = 48,
                id_col: str = "doc_id") -> DataFrame:
    """'Resize' stub via mapInPandas: emits the post-resize metadata a
    real resampler would (target dims + output byte count, crop rule
    min(n_bytes, w*h*3) for 3-channel). The codec call is the ONLY fake
    part; batching, schema, and the decode->transform->measure shape are
    exactly the production plumbing (swap the body for PIL/cv2 resize
    when codecs exist — decode_image is the documented hook).
    """
    schema = f"{id_col} LONG, width INT, height INT, out_bytes LONG"
    cap = target_w * target_h * 3

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "width": pd.array([target_w] * len(pdf), dtype="int32"),
                "height": pd.array([target_h] * len(pdf), dtype="int32"),
                "out_bytes": n.clip(upper=cap).astype("int64"),
            })

    return df.select(id_col, "payload").mapInPandas(resize, schema)


def fake_embed(df: DataFrame, dim: int = 8,
               id_col: str = "doc_id") -> DataFrame:
    """Feature extraction stub: a ``dim``-dimensional pseudo-embedding
    from the payload bytes via md5 (each component = a 4-hex-char slice
    / 2^16 — an exact dyadic rational, so the Python-side computation is
    bit-replayable in any engine with md5). Runs in mapInPandas exactly
    like a real encoder (model inference per Arrow batch); downstream it
    feeds the same ANN / near-dup operators as real embeddings
    (operators/similarity.py). Components come out as columns e0..e{d-1}
    rather than an array so the differential oracle compares scalars.
    """
    import hashlib

    cols = ", ".join(f"e{k} DOUBLE" for k in range(dim))
    schema = f"{id_col} LONG, {cols}"

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: pdf[id_col]}
            digests = [hashlib.md5(p).hexdigest() for p in pdf["payload"]]
            for k in range(dim):
                out[f"e{k}"] = [
                    int(d[4 * k:4 * k + 4], 16) / 65536.0 for d in digests]
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(embed, schema)
