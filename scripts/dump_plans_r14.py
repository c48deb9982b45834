#!/usr/bin/env python
"""Dump .explain('formatted') for the r14-optimization touched entries to
plans/r14/<query>_<tag>.txt (tag = before|after). Usage:

    python scripts/dump_plans_r14.py before [entry ...]
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

DEFAULT_ENTRIES = [
    # minhash family (shuffle-free signatures, fused checkpoint, pinned schema)
    "dedup_minhash_lsh",
    "dedup_minhash_incremental",
    "minhash_index_stats",
    # CC driver gate
    "dedup_fuzzy_clusters",
    # pinned reader schemas (lsh/ivfpq query+stats+publish)
    "lsh_index_query",
    "lsh_index_publish",
    "ann_index_query",
    "ann_topk_ivfpq",
    "ivfpq_index_stats",
    "ivfpq_index_publish",
    "hybrid_search_rrf_indexed",
    # dense-regime bitset intersect
    "graph_triangle_count",
    # wiki hint tightening (strategy gate)
    "wiki_articles_bodies",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_ENTRIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(_REPO, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    from wiki_mysql_spark.queries import QUERIES
    from wiki_mysql_spark.session import get_session

    spark = get_session("dump-plans-r14")
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
