"""r14 one-off: stream-provenance drain wall vs corpus size (r13
verdict item 7). The meter's static side (the corpus per-(passage,
source) counts) is localCheckpointed once per start; the claim to
verify is that a 10x corpus inventory does not multiply the drain
wall the way it would if the static plan re-derived per micro-batch.

Fixture: from the r13 bijection fixtures, a directory whose
documents.parquet holds the FULL x{c} corpus side (doc_id % 10 != 0,
all copies) plus the FIXED copy-0 landing batch (doc_id % 10 == 0,
doc_id < 1e8) — copy offsets are multiples of 1e8 so doc_id % 10 is
copy-invariant and the meter's own split reproduces exactly this
batch/corpus partition. Stream side fixed, static side 10x.

Recorded per decade: total meter wall (start + static build + drain,
min-of-passes) and the matrix cells — the bijection keeps the output
fixed across decades. Results: SCALING.md "r14: stream-provenance vs
corpus size".
"""

import os
import sys
import time

sys.path.insert(0, ".")

LOG = "/tmp/r14_stream/scale.log"


def log(m):
    print(m, flush=True)
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as fh:
        fh.write(m + "\n")


def build(copies: int) -> str:
    import duckdb

    out_dir = f"/tmp/r14_stream/x{copies}"
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(out):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (SELECT * FROM '/tmp/r13_prov/docs_x{copies}.parquet'
              WHERE doc_id % 10 <> 0
                 OR doc_id < 100000000)
        TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE 20000)""")
    return out_dir


def main():
    from tf_prisma_api_data_ingestion_spark.session import get_spark
    from tf_prisma_api_data_ingestion_spark.streaming.windows import (
        streaming_provenance_meter)

    spark = get_spark("r14_stream_prov_scale")
    # warm the streaming machinery once (micro-batch planner, memory
    # sink) so the x1 cell doesn't pay one-time JVM init
    streaming_provenance_meter(spark, "/root/testdata/sf0.001",
                               query_name="spv_warm").collect()
    for copies in (1, 10):
        sf_dir = build(copies)
        best, cells = float("inf"), None
        for p in range(3):
            t0 = time.time()
            rows = streaming_provenance_meter(
                spark, sf_dir,
                query_name=f"spv_x{copies}_{p}").collect()
            best = min(best, time.time() - t0)
            cells = len(rows)
        log(f"# stream-prov x{copies}: {best:.2f}s drain, "
            f"{cells} cells")
    spark.stop()
    log("# DONE")


if __name__ == "__main__":
    main()
