#!/usr/bin/env python
"""Dump .explain('formatted') for the r13-optimization touched entries to
plans/r13/<query>_<tag>.txt (tag = before|after). Usage:

    python scripts/dump_plans_r13.py before [entry ...]
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

DEFAULT_ENTRIES = [
    "lsh_index_build",
    "lsh_index_query",
    "lsh_index_publish",
    "hybrid_search_rrf_indexed",
    "hybrid_search_rrf",
    "dedup_embedding_lsh",
    "dedup_minhash_lsh",
    "dedup_minhash_incremental",
    "minhash_index_stats",
    "ann_index_build",
    "ann_index_query",
    "ann_topk_ivfpq",
    "ann_topk_pq",
    "ivfpq_index_publish",
    "ivfpq_index_stats",
    "dedup_semdedup",
    "graph_pagerank",
    "graph_triangle_count",
    "wiki_articles_bodies",
    "rag_retrieve_context",
    "dedup_ngram_jaccard",
    "dedup_substring_spans",
    "dedup_fuzzy_clusters",
    "decontam_bloom",
    "tokenize_bpe_train",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_ENTRIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(_REPO, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)

    from wiki_mysql_spark.queries import QUERIES
    from wiki_mysql_spark.session import get_session

    spark = get_session("dump-plans-r13")
    for name in names:
        if name not in QUERIES:
            print(f"# skip unknown entry {name}", file=sys.stderr)
            continue
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
