"""Scalar/column helpers mirroring the reference's row-level transforms.

All JVM-side built-ins (whole-stage-codegen friendly) — no Python UDFs.

Reference parity notes (citations = file:line in /root/reference):
- derive_ts_columns     <- add_timestamp_column, modules/src/prisma_report/lambda.py:151-162
- with_literal_columns  <- constant enrichment,  modules/src/prisma_report/lambda.py:175-177,199-203,356-358
- url_encode_path       <- urllib.parse.quote,   modules/src/prisma_report/lambda.py:142
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"  # reference format '%Y-%m-%d %H:%M:%S' (P:19)


def derive_ts_columns(df: DataFrame, epoch_ms_cols: Mapping[str, str]) -> DataFrame:
    """For each (src -> dst): epoch-milliseconds column -> formatted string.

    The reference divides by 1000 and strftimes (P:156-159); we keep the
    value a proper TimestampType for as long as possible and format only
    at the edge (``date_format``), so Catalyst can still prune/prune-push
    on the timestamp.
    """
    out = df
    for src, dst in epoch_ms_cols.items():
        out = out.withColumn(dst, F.date_format(F.timestamp_millis(F.col(src)), TS_FMT))
    return out


def format_ts(col: Column) -> Column:
    """TimestampType -> reference-formatted string (P:19)."""
    return F.date_format(col, TS_FMT)


def with_literal_columns(df: DataFrame, literals: Mapping[str, object]) -> DataFrame:
    """Append constant columns (run metadata enrichment, P:175-177)."""
    return df.withColumns({name: F.lit(v) for name, v in literals.items()})


def url_encode_path(col: Column) -> Column:
    """Percent-encode like ``urllib.parse.quote`` (P:142).

    Spark's ``url_encode`` is form-encoding and diverges from
    ``urllib.parse.quote`` on four characters; each is patched after the
    fact (the input's own '+' becomes '%2B' first, so every replace below
    is unambiguous):
      space: '+' -> '%20'   (form vs path encoding)
      '/':  '%2F' -> '/'    (quote's default safe='/')
      '~':  '%7E' -> '~'    (unreserved per RFC 3986; quote keeps it)
      '*':  kept by url_encode, quoted by urllib -> '%2A'
    """
    out = F.replace(F.url_encode(col), F.lit("+"), F.lit("%20"))
    out = F.replace(out, F.lit("%2F"), F.lit("/"))
    out = F.replace(out, F.lit("%7E"), F.lit("~"))
    return F.replace(out, F.lit("*"), F.lit("%2A"))
