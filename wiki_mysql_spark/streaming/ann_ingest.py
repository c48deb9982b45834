"""Streaming ingest into the persisted LSH index: foreachBatch + append.

The composition a production vector store actually runs: embeddings arrive
as a stream, the first micro-batch BUILDS the bucket-partitioned index
(freezing the plane parameters in the header), and every later micro-batch
APPENDS under the frozen planes — one new file per touched (tbl, bucket)
directory, nothing rewritten, the query side's partition pruning untouched
while ingestion runs. Because random-hyperplane LSH needs no retraining,
the drained index is row-identical to a one-shot build of the whole corpus
— which is exactly what the registry oracle asserts, independent of how
vectors were sliced into batches.

Idempotency note (deliberate scope): this drain is a single-shot
``availableNow`` run without a checkpoint, so a replayed micro-batch would
append its rows twice. A deployment that checkpoints would make the append
idempotent the same way the upsert sink does (stage per-batch deltas keyed
by batch_id and MERGE/overwrite instead of blind-append), or dedup on
``neighbor_id`` at query time; both change only this sink function.

(SURVEY §2.7 extension x the r8/r9 persisted-index family; no reference
hook — the reference has no vector or streaming surface.)
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from wiki_mysql_spark.operators.similarity import (
    lsh_index_append,
    lsh_index_build,
)
from wiki_mysql_spark.sources.tables import load_table


def run_stream_ann_ingest(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_files: int = 4,
    timeout_sec: int = 240,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 2,
) -> tuple[str, int]:
    """Stage the embeddings fixture as ``n_files`` parquet files (split by
    hash(vec_id) so batches are arbitrary id-slices), drain them one file
    per micro-batch into a persisted LSH index (build on the first
    non-empty batch, append on the rest), and return
    ``(index_root, n_batches)``. Raises on a timed-out drain — a partial
    index must never be returned as if complete."""
    emb = load_table(spark, sf_dir, "embeddings")
    staging = tempfile.mkdtemp(prefix="stream_ann_src_")
    emb.repartition(n_files, F.col("vec_id")).write.mode("overwrite").parquet(
        staging
    )
    index_root = tempfile.mkdtemp(prefix="stream_ann_idx_")
    state: dict[str, int | bool] = {"built": False, "batches": 0}

    def ingest(batch_df, batch_id: int) -> None:
        # cheap non-empty probe (limit 1): an empty batch must not BUILD —
        # it would freeze the header off zero rows and skip dim validation
        if not batch_df.limit(1).count():
            return
        if not state["built"]:
            lsh_index_build(
                batch_df, index_root,
                dim=dim, n_planes=n_planes, n_tables=n_tables,
            )
            state["built"] = True
        else:
            lsh_index_append(batch_df, index_root)
        state["batches"] = int(state["batches"]) + 1

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    q = (
        stream.writeStream.foreachBatch(ingest)
        .queryName(f"ann_ingest_{uuid.uuid4().hex[:12]}")
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_sec)
    finally:
        q.stop()
        shutil.rmtree(staging, ignore_errors=True)
    if not finished:
        raise TimeoutError(
            f"ann ingest did not drain within {timeout_sec}s "
            f"({state['batches']} micro-batches ingested)"
        )
    return index_root, int(state["batches"])
