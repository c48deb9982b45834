#!/usr/bin/env python
"""Recall evidence for the approximate-nearest-neighbor family.

The ANN entries are hash-oracled (deterministic parity with DuckDB) and
invariant-tested (subset-of-probed-cells, verifier-equals-bruteforce), but
parity says nothing about SEARCH QUALITY — how much of the true top-k each
approximate index recovers, which is the number a user sizes n_probe /
n_planes / window against. This script measures recall@k of every
approximate path against exact brute force over a real query sample and
emits one JSON artifact:

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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_q = int(os.environ.get("SPARK_GRAFT_ANN_QUERIES", "100"))

    from pyspark.sql import functions as F

    from wiki_mysql_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        ivfpq_topk,
        lsh_topk,
        pq_topk,
    )
    from wiki_mysql_spark.operators.similarity import kmeans_codebook
    from wiki_mysql_spark.session import get_session
    from wiki_mysql_spark.sources.tables import load_table

    spark = get_session("wiki_mysql_spark-ann-recall")
    emb = load_table(spark, sf_dir, "embeddings")
    n_corpus = emb.count()
    queries = emb.where(F.col("vec_id") < n_q).localCheckpoint(eager=False)

    t0 = time.time()
    exact = topk_sets(brute_force_topk(emb, queries, k=K))
    bruteforce_sec = round(time.time() - t0, 1)

    # the entries' own parameterizations, so the recall describes exactly
    # what the registry ships; plus one trained-codebook IVF variant
    book = kmeans_codebook(emb, n_centroids=8, n_iters=2)
    methods = {
        "ann_topk_lsh": lambda: lsh_topk(
            emb, queries, k=K, dim=64, n_planes=8, probe_bits=1
        ),
        "ann_topk_lsh_single_probe": lambda: lsh_topk(
            emb, queries, k=K, dim=64, n_planes=8
        ),
        "ann_topk_ivf": lambda: ivf_topk(emb, queries, k=K, n_centroids=8, n_probe=3),
        "ann_topk_ivf_nprobe2": lambda: ivf_topk(
            emb, queries, k=K, n_centroids=8, n_probe=2
        ),
        "ann_topk_ivf_trained": lambda: ivf_topk(
            emb, queries, k=K, n_centroids=8, n_probe=3, codebook=book
        ),
        "ann_topk_pq": lambda: pq_topk(emb, queries, k=K, m=4, n_centroids=8),
        "ann_topk_pq_m8k16_variant": lambda: pq_topk(
            emb, queries, k=K, m=8, n_centroids=16
        ),
        "ann_topk_ivfpq": lambda: ivfpq_topk(
            emb, queries, k=K, n_coarse=8, n_probe=3, m=4, n_centroids=8
        ),
        "ann_topk_ivfpq_m8k16_variant": lambda: ivfpq_topk(
            emb, queries, k=K, n_coarse=8, n_probe=3, m=8, n_centroids=16
        ),
    }
    results: dict[str, dict] = {}
    for name, run in methods.items():
        t0 = time.time()
        approx = topk_sets(run())
        sec = round(time.time() - t0, 1)
        per_q = [
            len(approx.get(q, frozenset()) & exact_set) / K
            for q, exact_set in exact.items()
        ]
        per_q.sort()
        results[name] = {
            "recall_at_10": round(sum(per_q) / len(per_q), 4),
            "recall_p10": round(per_q[len(per_q) // 10], 3),
            "recall_min": round(per_q[0], 3),
            "sec": sec,
        }
        print(f"# {name}: recall@10={results[name]['recall_at_10']}", file=sys.stderr)

    out = {
        "metric": "ann_recall_at_10",
        "value": {n: r["recall_at_10"] for n, r in results.items()},
        "unit": "recall",
        "k": K,
        "n_queries": len(exact),
        "n_corpus": n_corpus,
        "sf_dir": sf_dir,
        "bruteforce_sec": bruteforce_sec,
        "entries": results,
    }
    print(json.dumps(out))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
