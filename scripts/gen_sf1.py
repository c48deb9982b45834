#!/usr/bin/env python
"""Generate an sf1 fixture set (10x sf0.1) for the scale spot-sweep.

The driver's fixtures stop at sf0.1, but every 10x so far has exposed a new
bug class (z-order >65k keys at r3, codec single-core at r4), so r5 builds
its own sf1 — derived from the READ-ONLY sf0.1 tables by deterministic
10-way tiling, never touching /root/testdata:

  * keys shift by copy_index x (max_key + 1), so FK joins stay exactly
    10x the sf0.1 join graph;
  * part names get a per-copy suffix tag with pairwise edit distance > 3,
    and document words get a per-copy suffix — within-copy dedup/blocking
    structure is IDENTICAL to sf0.1 (relabeled vocabulary), while
    cross-copy near-dup pairs are impossible. Without this, 10 identical
    copies would square the near-dup pair sets (100x output) and the
    sweep would measure output hashing, not engine scaling;
  * embeddings copy 0 is sf0.1 verbatim; copies 1-9 are fresh draws from
    a per-label moment model fitted on sf0.1 (label mean + per-coordinate
    residual std, renormalized), so cluster structure and near-dup
    density match without cross-copy exact duplicates;
  * region/nation stay as-is (bounded dimensions at any scale).

Usage: python scripts/gen_sf1.py [--out /tmp/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# pairwise levenshtein > 3 by construction (distinct letters, length 6)
PART_TAGS = ["", "qqqqqq", "wwwwww", "kkkkkk", "zzzzzz", "vvvvvv",
             "jjjjjj", "xxxxxx", "uuuuuu", "yyyyyy", "bbbbbb", "gggggg"]


def tile_table(name: str, shifts: dict[str, int], copies: int,
               transform=None) -> pa.Table:
    t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    parts = []
    for i in range(copies):
        cols = {}
        for col in t.column_names:
            arr = t.column(col)
            if col in shifts and i > 0:
                arr = pa.chunked_array(
                    [pa.compute.add(c, shifts[col] * i) for c in arr.chunks]
                )
            cols[col] = arr
        if transform is not None:
            cols = transform(cols, i)
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    C = args.copies

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(args.out, f"{name}.parquet"))
        print(f"{name}: {table.num_rows} rows")

    for name in ("region", "nation"):
        write(name, pq.read_table(os.path.join(SRC, f"{name}.parquet")))

    write("supplier", tile_table("supplier", {"s_suppkey": 1000}, C))
    write("customer", tile_table("customer", {"c_custkey": 15000}, C))

    def part_tf(cols, i):
        if i > 0:
            names = cols["p_name"].to_pylist()
            cols["p_name"] = pa.chunked_array(
                [pa.array([f"{n} {PART_TAGS[i]}" for n in names])]
            )
        return cols

    write("part", tile_table("part", {"p_partkey": 20000}, C, part_tf))
    write("orders", tile_table(
        "orders", {"o_orderkey": 150000, "o_custkey": 15000}, C))
    write("lineitem", tile_table(
        "lineitem",
        {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000}, C))
    write("events", tile_table(
        "events", {"event_id": 100000, "user_id": 1500}, C))

    def doc_tf(cols, i):
        if i > 0:
            texts = cols["text"].to_pylist()
            tag = f"x{i}"
            new = [
                " ".join(w + tag for w in (t or "").split(" ")) if t else t
                for t in texts
            ]
            cols["text"] = pa.chunked_array([pa.array(new)])
            cols["n_chars"] = pa.chunked_array(
                [pa.array([len(t) if t is not None else 0 for t in new],
                          type=pa.int64())]
            )
        return cols

    write("documents", tile_table("documents", {"doc_id": 5000}, C, doc_tf))

    # embeddings: copy 0 verbatim; copies 1..C-1 from a per-label moment
    # model fitted on sf0.1 (seeded, deterministic)
    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.array(emb.column("label").to_pylist())
    centers, stds = {}, {}
    for lb in np.unique(labels):
        sel = vecs[labels == lb]
        centers[lb] = sel.mean(axis=0)
        stds[lb] = (sel - sel.mean(axis=0)).std(axis=0)
    rng = np.random.default_rng(20260814)
    n, dim = vecs.shape
    out_ids, out_vecs, out_labels = [list(range(n))], [vecs], [labels]
    for i in range(1, C):
        lb_draw = rng.choice(np.unique(labels), size=n,
                             p=np.bincount(labels) / n)
        pts = np.stack([
            centers[lb] + rng.normal(0, 1, dim).astype(np.float32) * stds[lb]
            for lb in lb_draw
        ])
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        out_ids.append([i * n + k for k in range(n)])
        out_vecs.append(pts.astype(np.float32))
        out_labels.append(lb_draw)
    table = pa.table({
        "vec_id": pa.array([x for c in out_ids for x in c], type=pa.int64()),
        "embedding": pa.array(
            [list(map(float, v)) for c in out_vecs for v in c],
            type=pa.list_(pa.float32()),
        ),
        "label": pa.array([int(x) for c in out_labels for x in c],
                          type=pa.int32()),
    })
    write("embeddings", table)


if __name__ == "__main__":
    main()
