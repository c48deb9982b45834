"""Streaming ingest into the persisted LSH index: foreachBatch writing
REPLAY-IDEMPOTENT per-batch deltas.

The composition a production vector store actually runs: embeddings arrive
as a stream and drain into the bucket-partitioned persisted index while the
query side keeps partition-pruning the same layout. The r9 shape
(build-on-first-batch, blind ``mode("append")`` on the rest) was correct
for a single un-checkpointed drain but NOT for replay: a checkpointed
restart re-delivers the in-flight micro-batch and a blind append would
double its rows. This version is the fix that r9 documented: the header is
initialized once up front (``lsh_index_init`` — there is no privileged
"first build" batch), and EVERY micro-batch is an idempotent
``lsh_index_write_delta`` keyed by its ``batch_id`` — a replayed batch
overwrites its own ``buckets/batch=<id>/`` directory with identical
deterministic content instead of appending a duplicate (the upsert sink's
per-batch-keyed pattern, per the foreachBatch exactly-once contract: a
replay reuses the batch id). Below the delta key the layout is still
``partitionBy(tbl, bucket)``, so ``lsh_index_query``'s partition pruning is
untouched; a periodic ``lsh_index_compact`` collapses the accumulated
delta directories back to ~one file per bucket.

Because random-hyperplane LSH needs no retraining, the drained index is
row-identical to a one-shot build of the whole corpus — which is exactly
what the registry oracle asserts, independent of how vectors were sliced
into batches AND of how many times any batch was replayed
(tests/test_streaming_live.py forces a written-then-failed batch to replay
and pins the equality).

(SURVEY §2.7 extension x the r8/r9 persisted-index family; no reference
hook — the reference has no vector or streaming surface.)
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import StreamingQueryException

from wiki_mysql_spark.operators.similarity import (
    ivfpq_index_init,
    ivfpq_index_write_delta,
    lsh_index_init,
    lsh_index_write_delta,
)
from wiki_mysql_spark.sources.tables import load_table


def _tmpdir(prefix: str) -> str:
    """mkdtemp registered for atexit cleanup — every ingest run used to
    leak a full persisted index copy in /tmp (r9 advice item)."""
    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def _drain_idempotent(
    spark: SparkSession,
    emb,
    index_root: str,
    write_delta,
    *,
    n_files: int,
    timeout_sec: int,
    poison_once_batch: int | None,
    id_col: str = "vec_id",
) -> int:
    """Shared drain loop of the streaming index sinks (LSH, IVFADC, and
    the minhash dedup index): stage ``emb`` as ``n_files`` parquet files
    (split by hash(``id_col``) so batches are arbitrary id-slices),
    drain one file per micro-batch through
    CHECKPOINTED foreachBatch, each batch an idempotent
    ``write_delta(batch_df, "batch=<id>")``. Returns the count of
    DISTINCT batch ids ingested; raises on a timed-out drain (a partial
    index must never be returned as if complete) and removes the partial
    index on any failure.

    ``poison_once_batch=k`` injects the replay scenario the sinks exist
    to survive: micro-batch ``k`` writes its delta and then FAILS before
    Spark records the commit; the drain restarts from the same
    checkpoint, the batch re-delivers with the SAME id, and the rewrite
    lands on its own directory — no duplicates (test-pinned for both
    index kinds)."""
    staging = tempfile.mkdtemp(prefix="stream_ann_src_")
    emb.repartition(n_files, F.col(id_col)).write.mode("overwrite").parquet(
        staging
    )
    checkpoint = tempfile.mkdtemp(prefix="stream_ann_ckpt_")
    seen: set[int] = set()
    poisoned: set[int] = set()

    def ingest(batch_df, batch_id: int) -> None:
        # cheap non-empty probe (limit 1): an empty batch writes no delta
        # (and a replayed empty batch stays a no-op)
        if not batch_df.limit(1).count():
            return
        write_delta(batch_df, f"batch={batch_id}")
        if poison_once_batch is not None and batch_id == poison_once_batch \
                and batch_id not in poisoned:
            # delta written, commit NOT recorded: the exact crash window a
            # blind append cannot survive
            poisoned.add(batch_id)
            raise RuntimeError(f"injected post-write failure @batch {batch_id}")
        seen.add(int(batch_id))

    def drain() -> bool:
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staging)
        )
        q = (
            stream.writeStream.foreachBatch(ingest)
            .queryName(f"ann_ingest_{uuid.uuid4().hex[:12]}")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        try:
            return q.awaitTermination(timeout_sec)
        finally:
            q.stop()

    try:
        try:
            finished = drain()
        except StreamingQueryException:
            if poison_once_batch is None:
                raise
            # restart from the SAME checkpoint: Spark re-delivers the
            # written-but-uncommitted batch under its original id
            finished = drain()
        if not finished:
            raise TimeoutError(
                f"ann ingest did not drain within {timeout_sec}s "
                f"({len(seen)} micro-batches ingested)"
            )
    except BaseException:
        # a failed drain must not leave a partial index for a caller to
        # mistake for a complete one (the atexit hook would only clean it
        # at interpreter exit)
        shutil.rmtree(index_root, ignore_errors=True)
        raise
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(checkpoint, ignore_errors=True)
    return len(seen)


def run_stream_ann_ingest(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_files: int = 4,
    timeout_sec: int = 240,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 2,
    poison_once_batch: int | None = None,
) -> tuple[str, int]:
    """Drain the embeddings fixture into a persisted LSH index
    (:func:`_drain_idempotent`): header initialized up front (hyperplane
    LSH needs no training), every micro-batch an idempotent
    ``lsh_index_write_delta``. Returns ``(index_root, n_batches)``."""
    emb = load_table(spark, sf_dir, "embeddings")
    index_root = _tmpdir("stream_ann_idx_")
    lsh_index_init(
        spark, index_root, dim=dim, n_planes=n_planes, n_tables=n_tables,
    )
    n = _drain_idempotent(
        spark, emb, index_root,
        lambda df, delta: lsh_index_write_delta(df, index_root, delta),
        n_files=n_files, timeout_sec=timeout_sec,
        poison_once_batch=poison_once_batch,
    )
    return index_root, n


def run_stream_ivfpq_ingest(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_files: int = 4,
    timeout_sec: int = 240,
    n_coarse: int = 16,
    coarse_iters: int = 2,
    m: int = 8,
    n_centroids: int = 16,
    poison_once_batch: int | None = None,
) -> tuple[str, int]:
    """Drain the embeddings fixture into a persisted IVFADC index — the
    r9 verdict's "no streaming ingest path for IVFADC" gap. The FAISS
    lifecycle split maps onto streaming exactly: ``ivfpq_index_init``
    TRAINS the quantizers once on the even-id half (the bounded offline
    sample — the same slice the append oracle trains on, so the drained
    index is oracle-checkable end to end), then every micro-batch encodes
    its vectors under the FROZEN books as an idempotent
    ``ivfpq_index_write_delta``. Returns ``(index_root, n_batches)``."""
    emb = load_table(spark, sf_dir, "embeddings")
    index_root = _tmpdir("stream_pq_idx_")
    ivfpq_index_init(
        emb.where(F.col("vec_id") % 2 == 0), index_root,
        n_coarse=n_coarse, coarse_iters=coarse_iters, m=m,
        n_centroids=n_centroids,
    )
    n = _drain_idempotent(
        spark, emb, index_root,
        lambda df, delta: ivfpq_index_write_delta(df, index_root, delta),
        n_files=n_files, timeout_sec=timeout_sec,
        poison_once_batch=poison_once_batch,
    )
    return index_root, n


def run_stream_minhash_ingest(
    spark: SparkSession,
    docs,
    *,
    n_files: int = 4,
    timeout_sec: int = 240,
    poison_once_batch: int | None = None,
) -> tuple[str, int]:
    """Drain a documents frame into a persisted MINHASH SIGNATURE index
    (:func:`_drain_idempotent` over the dedup-index delta writer) — the
    streaming half of incremental dedup: documents arrive as a stream and
    their banded signatures land in the (band, bk)-partitioned index
    while `minhash_index_query` keeps partition-pruning the same layout
    (the delta key sits above the layout columns). The minhash scheme,
    like hyperplane LSH, needs no training, so the header initializes up
    front (`minhash_index_init` — no privileged first batch) and the
    drained index is row-identical to a one-shot build of the whole
    corpus, independent of batch slicing and of replays (the registry
    oracle + the forced-replay test assert exactly that). Returns
    ``(index_root, n_batches)``."""
    from wiki_mysql_spark.operators.dedup import (
        minhash_index_init,
        minhash_index_write_delta,
    )

    index_root = _tmpdir("stream_mh_idx_")
    minhash_index_init(spark, index_root)
    n = _drain_idempotent(
        spark, docs, index_root,
        lambda df, delta: minhash_index_write_delta(df, index_root, delta),
        n_files=n_files, timeout_sec=timeout_sec,
        poison_once_batch=poison_once_batch, id_col="doc_id",
    )
    return index_root, n
