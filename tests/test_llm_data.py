"""Behavioral tests for dedup/similarity/text operators (beyond the oracle
equivalence, which tests/test_oracle.py covers): known duplicates are found,
LSH candidates are a subset of brute-force truth, signatures behave."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wiki_mysql_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from wiki_mysql_spark.operators.similarity import brute_force_topk, lsh_topk

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # exact dup
    (3, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),  # near dup
    (4, "one two three four five six seven eight nine ten"),
    (5, "unrelated totally different content entirely separate words"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_duplicates(docs):
    groups = exact_duplicates(docs).where(F.col("n_copies") > 1).collect()
    assert len(groups) == 1
    assert groups[0]["n_copies"] == 2 and groups[0]["keep_doc_id"] == 1


def test_minhash_lsh_finds_exact_and_near(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             minhash_lsh_pairs(docs, jaccard_threshold=0.5).collect()}
    assert pairs.get((1, 2)) == 1.0
    # 1 vs 3 share 7 of 9 distinct shingles -> 7/9 ≈ 0.777778
    assert (1, 3) in pairs and abs(pairs[(1, 3)] - 7 / 9) < 1e-5
    assert all(a < b for a, b in pairs)
    assert not any({a, b} & {4, 5} for a, b in pairs)


def test_simhash_exact_dup_distance_zero(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
             simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0


def test_ngram_jaccard_values(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, threshold=0.1).collect()}
    assert pairs[(1, 2)] == 1.0
    assert abs(pairs[(1, 3)] - 7 / 9) < 1e-5


def test_lsh_topk_subset_of_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, q, k=5).collect()
    approx = lsh_topk(emb, q, k=5, dim=64, n_planes=8).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact}
    # every LSH result must carry the same similarity the exact path computes
    all_sims = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in brute_force_topk(emb, q, k=10**6).collect()
    }
    for r in approx:
        assert all_sims[(r["query_id"], r["neighbor_id"])] == r["cos_sim"]
    # brute force returns exactly k per query
    from collections import Counter

    per_q = Counter(r["query_id"] for r in exact)
    assert all(v == 5 for v in per_q.values())
    assert set(per_q) == {0, 1, 2}
    # sanity: top-1 exact similarity is the global max for that query
    for qid in per_q:
        top1 = [r for r in exact if r["query_id"] == qid and r["rank"] == 1][0]
        assert top1["cos_sim"] == max(
            s for (g, _), s in all_sims.items() if g == qid
        )


def test_multimodal_resize_and_stub_gates(spark):
    from wiki_mysql_spark.operators.multimodal import (
        attach_binary_payload,
        decode_image,
        resize_image,
        resize_images,
        sample_frames,
    )

    docs = attach_binary_payload(
        spark.createDataFrame([(1, "hello world"), (2, "xy")], ["doc_id", "text"])
    )
    out = {r["doc_id"]: r["n_bytes"] for r in resize_images(docs, width=4, height=4).collect()}
    assert out == {1: 16, 2: 16}  # fake resize yields width*height bytes

    frames = sample_frames(docs, n_frames=4).collect()
    assert len(frames) == 8  # 2 docs x 4 frames
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_doc.values())

    # real codec paths are explicit stubs, not silent fakes
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_image(b"bytes")
    with _pytest.raises(NotImplementedError):
        resize_image(b"bytes", 8, 8)


def test_kmeans_codebook_trains_and_is_deterministic(spark):
    from wiki_mysql_spark.operators.similarity import ivf_topk, kmeans_codebook

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seeds = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id") < 4).collect()
    }
    book = kmeans_codebook(emb, n_centroids=4, n_iters=2)
    # cells keyed by surviving seed ids; dims preserved
    assert set(c for c, _ in book) <= set(seeds)
    assert all(len(v) == 64 for _, v in book)
    # training moved every surviving center off its seed
    assert all(v != seeds[c] for c, v in book)
    # deterministic: identical on retrain (rounding pins the fixpoint)
    assert book == kmeans_codebook(emb, n_centroids=4, n_iters=2)

    # trained IVF assigns every corpus vector to exactly one cell and its
    # results carry exact cosine values (subset-of-bruteforce invariant)
    q = emb.where(F.col("vec_id") < 3)
    approx = ivf_topk(emb, q, k=5, n_probe=2, codebook=book).collect()
    all_sims = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in brute_force_topk(emb, q, k=10**6).collect()
    }
    assert approx
    for r in approx:
        assert all_sims[(r["query_id"], r["neighbor_id"])] == r["cos_sim"]


def test_connected_components_chain_cycle_selfloop(spark):
    from wiki_mysql_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        # a 4-chain, a triangle (cycle), a self-loop, an isolated pair
        [(1, 2), (2, 3), (3, 4), (20, 21), (21, 22), (22, 20), (30, 30), (40, 41)],
        ["src", "dst"],
    )
    got = {r["node"]: r["label"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 20: 20, 21: 20, 22: 20, 30: 30, 40: 40, 41: 40}


def test_embedding_lsh_pairs_subset_of_bruteforce(spark):
    """The bucketed pair generator must emit a subset of the exact all-pairs
    result with identical cosine values (recall < 1 allowed, precision = 1
    after verification), and must actually find something at fixture scale."""
    from tests.conftest import SF_CORRECTNESS
    from wiki_mysql_spark.operators.dedup import (
        embedding_lsh_pairs,
        embedding_near_dup_pairs,
    )
    from wiki_mysql_spark.sources.tables import load_table

    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_near_dup_pairs(emb, threshold=0.25).collect()
    }
    bucketed = embedding_lsh_pairs(emb, threshold=0.25, n_bands=2).collect()
    assert bucketed, "LSH found no pairs at all"
    for r in bucketed:
        assert exact[(r["id_a"], r["id_b"])] == r["cos_sim"]
    # banding trade-off sanity: 2 bands find at least what 1 band finds
    one_band = embedding_lsh_pairs(emb, threshold=0.25, n_bands=1).collect()
    assert len(bucketed) >= len(one_band)


def test_bmp_codec_pixel_roundtrip():
    """The real BMP codec: encode->decode is pixel-exact for every size that
    exercises row padding (w*3 % 4 in all residues), and the header-only
    decode_image agrees with the full pixel decode."""
    import numpy as np

    from wiki_mysql_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
        encode_bmp,
    )

    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (2, 3), (3, 2), (4, 4), (5, 7), (16, 12), (33, 9)]:
        pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        bmp = encode_bmp(pix)
        assert bmp[:2] == b"BM"
        assert decode_image(bmp) == (w, h)
        back = decode_bmp(bmp)
        assert back.shape == (h, w, 3)
        assert (back == pix).all()


def test_bmp_resize_nearest_neighbor():
    import numpy as np

    from wiki_mysql_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
        encode_bmp,
        resize_image,
    )

    # a 2x2 image with distinct corner colors upscaled 2x: each corner color
    # must fill its quadrant under nearest-neighbor
    pix = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]], dtype=np.uint8
    )
    out = resize_image(encode_bmp(pix), 4, 4)
    assert decode_image(out) == (4, 4)
    up = decode_bmp(out)
    assert (up[0, 0] == [255, 0, 0]).all() and (up[0, 3] == [0, 255, 0]).all()
    assert (up[3, 0] == [0, 0, 255]).all() and (up[3, 3] == [255, 255, 0]).all()
    assert (up[:2, :2] == [255, 0, 0]).all()


def test_bmp_codec_rejects_non_bmp():
    import pytest as _pytest

    from wiki_mysql_spark.operators.multimodal import decode_bmp, decode_image

    with _pytest.raises(ValueError):
        decode_bmp(b"JFIF not a bmp")
    # JPEG is a real codec now — a truncated stream errors, it is not
    # "unsupported"; only formats with no native codec stay NotImplemented
    with _pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0JFIF")  # malformed: no SOF0 header
    with _pytest.raises(NotImplementedError):
        decode_image(b"\x1aE\xdf\xa3webm-ish")  # video needs a codec library


def test_png_codec_roundtrip_all_filters_and_colortypes():
    """The real PNG codec (stdlib-zlib DEFLATE): encode->decode is
    pixel-exact for grey/RGB/RGBA across every scanline filter type (0-4)
    and the per-row cycling mode, on sizes that stress the left-pixel
    recurrences (w=1 edge, wide rows) and on gradient data where
    Average/Paeth actually differ from Sub/Up."""
    import numpy as np

    from wiki_mysql_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    for w, h in [(1, 1), (1, 5), (7, 3), (16, 12), (40, 2)]:
        for ch in (None, 3, 4):
            shape = (h, w) if ch is None else (h, w, ch)
            pix = rng.integers(0, 256, size=shape, dtype=np.uint8)
            for ft in [0, 1, 2, 3, 4, None]:
                png = encode_png(pix, filter_type=ft)
                assert png[:8] == b"\x89PNG\r\n\x1a\n"
                back = decode_png(png)
                assert back.shape == pix.shape and (back == pix).all(), (
                    w, h, ch, ft,
                )
            assert decode_image(png) == (w, h)  # header-only real decode
    grad = np.tile(np.arange(256, dtype=np.uint8), (4, 1))[:, :100]
    for ft in range(5):
        assert (decode_png(encode_png(grad, filter_type=ft)) == grad).all()


def test_png_codec_compresses_and_rejects_malformed():
    import numpy as np
    import pytest as _pytest

    from wiki_mysql_spark.operators.multimodal import decode_png, encode_png

    # constant image under filter 1 (Sub) deflates far below raw size —
    # proof the DEFLATE path is really compressing, not storing
    flat = np.full((64, 64, 3), 200, dtype=np.uint8)
    png = encode_png(flat, filter_type=1)
    assert len(png) < 64 * 64 * 3 // 10
    with _pytest.raises(ValueError):
        decode_png(b"BM not a png")
    with _pytest.raises(NotImplementedError):
        # 16-bit depth is out of scope and must be refused, not mis-decoded
        import struct as _struct
        import zlib as _zlib

        ihdr = _struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
        chunk = (
            _struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + _struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


def test_pagerank_hand_computed_star(spark):
    """3-iteration PageRank on a -> b <- c, hand-computed: sources settle at
    1-d = 0.15; the sink converges to 0.15 + 0.85*(0.15 + 0.15) = 0.405."""
    from wiki_mysql_spark.operators.graph import pagerank

    edges = spark.createDataFrame([("a", "b"), ("c", "b")], ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(edges, n_iters=3).collect()}
    assert got == {"a": 0.15, "c": 0.15, "b": 0.405}


def test_pagerank_dangling_redistribution(spark):
    """Standard-definition mode on a star with a dangling sink (a -> b <- c;
    b has no out-edges): checked against an independent pure-python replay of
    the same rounded iterations, and against the defining invariant of the
    standard formulation — total rank mass stays N every round."""
    from wiki_mysql_spark.operators.graph import pagerank

    edges = spark.createDataFrame([("a", "b"), ("c", "b")], ["src", "dst"])
    n_iters, d = 3, 0.85
    got = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, n_iters=n_iters, damping=d, redistribute_dangling=True
        ).collect()
    }

    # independent replay (dict-based, same per-iteration 9-digit rounding)
    out = {"a": ["b"], "c": ["b"], "b": []}
    nodes = ["a", "b", "c"]
    rank = {n: 1.0 for n in nodes}
    for _ in range(n_iters):
        dm = sum(rank[n] for n in nodes if not out[n])
        s = {n: 0.0 for n in nodes}
        for u, targets in out.items():
            for v in targets:
                s[v] += rank[u] / len(targets)
        rank = {
            n: round((0.15 + d * s[n]) + d * dm / len(nodes), 9) for n in nodes
        }
    assert set(got) == set(rank)
    for n in nodes:
        assert got[n] == pytest.approx(rank[n], abs=1e-9)
    # mass conservation: sum(rank) == N (up to rounding drift)
    assert sum(got.values()) == pytest.approx(len(nodes), abs=1e-6)


def test_embedding_cosine_gate_refuses_large_input(spark):
    """The all-pairs brute-force baseline must refuse inputs above its size
    gate instead of launching an O(n^2) shuffle (VERDICT r2 'what's wrong'
    #2). At test scale the same call under the default gate still works."""
    from tests.conftest import SF_SMOKE

    from wiki_mysql_spark.operators.dedup import embedding_near_dup_pairs
    from wiki_mysql_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        embedding_near_dup_pairs(emb, max_input_bytes=1)
    # under the default gate the fixture passes and produces pairs
    assert embedding_near_dup_pairs(emb, threshold=0.9).columns == [
        "id_a", "id_b", "cos_sim",
    ]


def test_salt_hash_skips_unhashable_columns(spark):
    """r6 ADVICE: the deterministic default salt (xxhash64 over the row's
    columns) must keep working on schemas containing map columns — hash
    expressions reject MapType, and the all-columns spelling regressed
    vs the old F.rand default there. Also: a frame with NO hashable
    column raises the explicit ask-for-salt_source error, not an
    AnalysisException from inside codegen."""
    import pytest as _pytest

    from wiki_mysql_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [(1, 10, {"a": 1}), (1, 20, {"b": 2}), (2, 30, {"c": 3})],
        "k int, v int, m map<string,int>",
    )
    got = {
        r["k"]: r["total"]
        for r in salted_agg(
            df, "k", {"total": ("v", "sum")}, n_salt=4
        ).collect()
    }
    assert got == {1: 30, 2: 30}

    only_map = df.select("m")
    with _pytest.raises(ValueError, match="salt_source"):
        salted_agg(only_map, "m", {"n": ("m", "count")})


def test_skew_safe_self_pairs_hot_block_exact(spark):
    """A deliberately hot block (Zipfian first-token key) must route through
    the triangle decomposition and still produce EXACTLY the naive pair set
    — both the hot path and the cold path, and their union (VERDICT r2 next
    item 6)."""
    from wiki_mysql_spark.operators.skew import skew_safe_block_self_pairs

    rows = [(i, "hot") for i in range(300)] + [
        (1000 + b * 10 + i, f"cold{b}") for b in range(5) for i in range(7)
    ]
    df = spark.createDataFrame(rows, ["id", "blk"])
    got = skew_safe_block_self_pairs(
        df, block="blk", id_col="id", n_salt=4, hot_threshold=100
    ).select(
        F.col("l")["id"].alias("a"), F.col("r")["id"].alias("b")
    )

    a = df.select(F.col("blk"), F.col("id").alias("a"))
    b = df.select(F.col("blk"), F.col("id").alias("b"))
    naive = a.join(b, "blk").where(F.col("a") < F.col("b")).select("a", "b")

    assert got.count() == naive.count() == 300 * 299 // 2 + 5 * (7 * 6 // 2)
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_interval_join_multiplicity_and_collisions(spark):
    """Duplicate input rows keep inner-join multiplicity (no silent dedup),
    and non-key columns sharing a name between points and intervals don't
    blow up with an ambiguous-reference error (ADVICE r2)."""
    import datetime as dt

    from wiki_mysql_spark.operators.intervals import interval_point_join

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    # two IDENTICAL intervals for key k1, and a colliding non-key col "tag"
    points = spark.createDataFrame(
        [("k1", t, "p")], ["key", "ts", "tag"]
    )
    intervals = spark.createDataFrame(
        [
            ("k1", t - dt.timedelta(hours=1), t + dt.timedelta(hours=1), "i"),
            ("k1", t - dt.timedelta(hours=1), t + dt.timedelta(hours=1), "i"),
        ],
        ["key", "lo", "hi", "tag"],
    )
    out = interval_point_join(
        points, intervals, key="key", time_col="ts",
        lo_col="lo", hi_col="hi", bin_seconds=3600,
    )
    rows = out.collect()
    # naive-join semantics: 1 point x 2 duplicate intervals = 2 rows
    assert len(rows) == 2
    # points' version of the colliding column survives
    assert all(r["tag"] == "p" for r in rows)
    assert set(out.columns) == {"key", "ts", "tag", "lo", "hi"}


def test_wav_codec_roundtrip_and_features():
    import numpy as np

    from wiki_mysql_spark.operators.multimodal import (
        audio_features,
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(11)
    # mono and stereo, odd and even lengths
    for n, ch in [(1, 1), (7, 1), (8, 2), (160, 1), (333, 2)]:
        s = rng.integers(-32768, 32767, size=(n, ch), dtype=np.int16)
        wav = encode_wav(s if ch > 1 else s[:, 0], rate=16000)
        rate, got_ch, back = decode_wav(wav)
        assert (rate, got_ch) == (16000, ch)
        assert back.shape == (n, ch)
        assert (back == s).all()

    # silence has zero RMS; a constant signal's RMS is its magnitude
    rate, ch, frames, rms = audio_features(
        encode_wav(np.zeros(100, dtype=np.int16))
    )
    assert (rate, ch, frames, rms) == (8000, 1, 100, 0.0)
    _, _, _, rms2 = audio_features(
        encode_wav(np.full(50, 1000, dtype=np.int16))
    )
    assert abs(rms2 - 1000.0) < 1e-9

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_wav(b"not riff data at all")


def test_gopher_rules_fire_per_fixture(spark):
    """Each Gopher rule rejects its designed fixture doc and the
    all-rules-pass doc passes (rules from the public Gopher paper A1.1)."""
    from wiki_mysql_spark.functions.text import gopher_features
    from wiki_mysql_spark.queries.llm_data import _QF_FIXTURE

    df = spark.createDataFrame(_QF_FIXTURE, ["doc_id", "text"])
    feats = gopher_features(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[feats[k].alias(k) for k in (
                "n_words", "mean_word_len", "symbol_word_ratio",
                "frac_alpha_words", "n_stop_present", "bullet_line_frac",
                "ellipsis_line_frac", "gopher_pass",
            )],
        ).collect()
    }
    assert rows[300001]["gopher_pass"] is True
    assert rows[300001]["n_words"] >= 50 and rows[300001]["n_stop_present"] >= 2
    # bullets: 3 of 4 lines start with a bullet char
    assert abs(rows[300002]["bullet_line_frac"] - 0.75) < 1e-9
    # ellipsis: 2 of 3 lines end with "..." -> fails the <= 0.3 rule
    assert rows[300003]["ellipsis_line_frac"] > 0.3
    assert not rows[300003]["gopher_pass"]
    # symbol-heavy: 4 '#' over 5 words -> 0.8 > 0.1
    assert rows[300004]["symbol_word_ratio"] > 0.1
    # numeric-only words fail the alpha-word floor
    assert rows[300005]["frac_alpha_words"] == 0.0
    # empty doc: guards give zeros, no NaN/KeyError
    assert rows[300009]["n_words"] == 0 and rows[300009]["mean_word_len"] == 0.0
    assert not rows[300009]["gopher_pass"]


def test_c4_rules_fire_per_fixture(spark):
    from wiki_mysql_spark.functions.text import c4_features
    from wiki_mysql_spark.queries.llm_data import _QF_FIXTURE

    df = spark.createDataFrame(_QF_FIXTURE, ["doc_id", "text"])
    feats = c4_features(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[feats[k].alias(k) for k in (
                "n_lines", "n_kept_lines", "kept_chars", "has_lorem",
                "has_brace", "c4_keep_doc",
            )],
        ).collect()
    }
    # the clean doc keeps all 4 terminal-punctuated >=5-word lines
    assert rows[300001]["n_kept_lines"] == 4 and rows[300001]["c4_keep_doc"]
    assert rows[300001]["kept_chars"] == 4 * len(
        "the quick brown fox jumps over lazy dogs and runs with great speed of night."
    )
    # lorem ipsum and brace docs are dropped doc-level
    assert rows[300006]["has_lorem"] and not rows[300006]["c4_keep_doc"]
    assert rows[300007]["has_brace"] and not rows[300007]["c4_keep_doc"]
    # the javascript line is removed line-level: 4 lines, 3 kept -> keep_doc
    assert rows[300008]["n_lines"] == 4 and rows[300008]["n_kept_lines"] == 3
    assert rows[300008]["c4_keep_doc"]
    # bullet/short lines don't end in terminal punctuation -> nothing kept
    assert rows[300002]["n_kept_lines"] == 0 and not rows[300002]["c4_keep_doc"]
    assert rows[300009]["n_lines"] == 0 and not rows[300009]["c4_keep_doc"]


def test_triangle_count_hand_graphs(spark):
    """K4 (4 triangles) + pendant + separate triangle + a duplicate and a
    reversed edge: dedup, canonicalization, and the degree-ordered wedge
    closure must count each triangle exactly once."""
    from wiki_mysql_spark.operators.graph import triangle_count

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
             (6, 7), (7, 8), (6, 8), (2, 1), (3, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    r = triangle_count(df).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (8, 10, 5)
    # star graph: many wedges at the hub in the NAIVE formulation, but zero
    # triangles — and the hub is a wedge SINK here (no wedge explosion)
    star = spark.createDataFrame([(0, i) for i in range(1, 30)], ["src", "dst"])
    r2 = triangle_count(star).collect()[0]
    assert (r2["n_nodes"], r2["n_edges"], r2["n_triangles"]) == (30, 29, 0)


def test_png_entry_pixels_are_char_domain_unicode_safe(spark):
    """The PNG decode entry's builder must stay exact for NON-ASCII text:
    pixels are character codepoints mod 256, so a multibyte document
    produces the same pixel_sum the char-indexed oracle computes (the
    byte-domain formulation silently diverged on non-ASCII)."""
    import duckdb

    from wiki_mysql_spark.queries.registry import ORACLE

    import tempfile

    from wiki_mysql_spark.queries.multimodal_queries import multimodal_decode_png

    rows = [(1, "héllo wörld ünïcode"), (2, "日本語テキスト"), (3, "plain ascii")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    with tempfile.TemporaryDirectory() as sf_dir:
        docs.coalesce(1).write.parquet(sf_dir + "/documents.parquet")
        got = {
            r["doc_id"]: (r["width"], r["height"], r["pixel_sum"],
                          r["roundtrip_exact"])
            for r in multimodal_decode_png(spark, sf_dir).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
        )
        want = {
            r[0]: (r[1], r[2], r[3], r[4])
            for r in con.sql(ORACLE["multimodal_decode_png"]).fetchall()
        }
    assert got == want
    assert all(v[3] for v in got.values())  # every round-trip pixel-exact


def _png_decode_independent(payload: bytes):
    """Minimal INDEPENDENT PNG decoder for parity testing: pure Python (no
    numpy), written directly from the PNG spec (RFC 2083 §6) as a separate
    code path from operators/multimodal.decode_png — a bug in the
    production decoder's vectorized unfilter cannot be mirrored here.
    8-bit grey/RGB/RGBA, no interlace."""
    import struct
    import zlib

    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    pos, ihdr, idat = 8, None, b""
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        crc = struct.unpack_from(">I", payload, pos + 8 + size)[0]
        assert crc == (zlib.crc32(ctype + data) & 0xFFFFFFFF), "bad CRC"
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + size
    w, h, depth, color_type, comp, filt, interlace = ihdr
    assert depth == 8 and comp == 0 and filt == 0 and interlace == 0
    bpp = {0: 1, 2: 3, 6: 4}[color_type]
    raw = zlib.decompress(idat)
    stride = w * bpp
    out = []
    prev = [0] * stride
    for y in range(h):
        off = y * (stride + 1)
        ft = raw[off]
        line = list(raw[off + 1 : off + 1 + stride])
        cur = [0] * stride
        for i in range(stride):
            x = line[i]
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                r = x
            elif ft == 1:
                r = x + a
            elif ft == 2:
                r = x + b
            elif ft == 3:
                r = x + (a + b) // 2
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                r = x + pred
            cur[i] = r % 256
        out.append(cur)
        prev = cur
    return w, h, bpp, out


def test_png_codec_vs_independent_spec_decoder():
    """Cross-validation: bytes produced by encode_png decode identically
    through the production decoder AND a from-the-spec pure-Python decoder
    written independently in this test (incl. CRC verification, which the
    production decoder skips)."""
    import numpy as np

    from wiki_mysql_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(23)
    for shape in [(5, 7), (5, 7, 3), (3, 4, 4), (1, 1), (2, 40, 3)]:
        pix = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ft in [0, 1, 2, 3, 4, None]:
            png = encode_png(pix, filter_type=ft)
            w, h, bpp, rows = _png_decode_independent(png)
            flat = pix.reshape(pix.shape[0], -1)
            assert (w, h) == (pix.shape[1], pix.shape[0])
            assert rows == [list(map(int, r)) for r in flat], (shape, ft)
            prod = decode_png(png)
            assert (prod.reshape(prod.shape[0], -1) == flat).all()


def test_jpeg_codec_roundtrip_tolerances():
    """The real baseline-JPEG codec (spec-derived: DCT + Annex-K quant +
    canonical Huffman + stuffing): encode->decode stays within lossy-codec
    tolerances across shapes, gray/color, and qualities; exact for flat
    images (all energy in DC) and near-exact at quality 100."""
    import numpy as np

    from wiki_mysql_spark.operators.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    for h, w, gray, q, tol in [
        (8, 8, False, 95, 32), (16, 12, False, 95, 32), (17, 9, False, 95, 32),
        (1, 1, False, 95, 8), (5, 40, True, 95, 16), (12, 16, False, 100, 4),
        (64, 64, False, 95, 32), (3, 3, True, 50, 64),
    ]:
        shape = (h, w) if gray else (h, w, 3)
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(px, quality=q))
        assert dec.shape == px.shape
        err = np.abs(dec.astype(int) - px.astype(int)).max()
        assert err <= tol, (h, w, gray, q, err)
    flat = np.full((10, 14, 3), 200, np.uint8)
    assert (decode_jpeg(encode_jpeg(flat)) == flat).all()
    x = np.linspace(0, 255, 48)
    grad = np.stack(np.meshgrid(x, x), -1)
    grad = np.concatenate([grad, grad[..., :1]], -1).astype(np.uint8)
    gerr = np.abs(
        decode_jpeg(encode_jpeg(grad, quality=95)).astype(int) - grad.astype(int)
    ).max()
    assert gerr <= 4, gerr  # smooth content reconstructs near-exactly


def test_jpeg_chroma_subsampling_roundtrip():
    """4:2:0 / 4:2:2 encode->decode (r4 verdict item 2 — the layout nearly
    every camera/web JPEG uses): dims exact at odd sizes, luma within the
    4:4:4 tolerance (subsampling must not touch Y), smooth images
    near-exact in full RGB, and the SOF header carries the right sampling
    factors per component."""
    import struct

    import numpy as np

    from wiki_mysql_spark.operators.multimodal import (
        _rgb_to_ycbcr,
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(17)
    for h, w in [(16, 16), (17, 23), (9, 2), (1, 1), (33, 31), (40, 56)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for mode in ("420", "422"):
            dec = decode_jpeg(encode_jpeg(px, quality=95, subsampling=mode))
            assert dec.shape == px.shape, (h, w, mode)
            yerr = np.abs(
                _rgb_to_ycbcr(dec)[..., 0] - _rgb_to_ycbcr(px)[..., 0]
            )
            assert yerr.max() <= 48, (h, w, mode, yerr.max())

    # smooth gradient: chroma subsampling is near-transparent in full RGB
    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    grad = np.stack(
        [yy * 255 / h, xx * 255 / w, (yy + xx) * 255 / (h + w)], axis=-1
    ).astype(np.uint8)
    for mode, tol in (("444", 4), ("422", 8), ("420", 8)):
        dec = decode_jpeg(encode_jpeg(grad, quality=95, subsampling=mode))
        err = np.abs(dec.astype(int) - grad.astype(int)).max()
        assert err <= tol, (mode, err)

    # SOF sampling factors: Y carries (h, v), chroma stays 1x1
    for mode, want_hv in (("444", 0x11), ("422", 0x21), ("420", 0x22)):
        b = encode_jpeg(grad, quality=95, subsampling=mode)
        i = b.find(b"\xff\xc0")
        nc = b[i + 9]
        assert nc == 3
        hvs = [b[i + 11 + 3 * k] for k in range(nc)]
        assert hvs == [want_hv, 0x11, 0x11], (mode, hvs)

    # 4:2:0 must compress chroma-heavy content harder than 4:4:4
    big = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    assert len(encode_jpeg(big, quality=95, subsampling="420")) < len(
        encode_jpeg(big, quality=95, subsampling="444")
    )


def test_jpeg_dct_matches_textbook_formula():
    """Cross-validation of the transform core against an INDEPENDENT
    spelling: the 8x8 matrix-product DCT used by the codec must equal the
    four-nested-loop ITU-T T.81 / textbook DCT-II formula, and the IDCT
    must invert it to float precision."""
    import numpy as np

    from wiki_mysql_spark.operators.multimodal import _DCT_M

    rng = np.random.default_rng(11)
    x = rng.uniform(-128, 127, (8, 8))
    got = _DCT_M @ x @ _DCT_M.T
    want = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
            cv = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
            s = 0.0
            for i in range(8):
                for j in range(8):
                    s += (
                        x[i, j]
                        * np.cos((2 * i + 1) * u * np.pi / 16)
                        * np.cos((2 * j + 1) * v * np.pi / 16)
                    )
            want[u, v] = cu * cv * s
    assert np.abs(got - want).max() < 1e-9
    assert np.abs(_DCT_M.T @ got @ _DCT_M - x).max() < 1e-9
    assert np.abs(_DCT_M @ _DCT_M.T - np.eye(8)).max() < 1e-12  # orthonormal


def test_jpeg_stream_structure_independent_parse():
    """Walk the emitted bytes with an independent minimal parser: marker
    framing, segment lengths, DQT/SOF0/DHT/SOS presence and order, and
    byte-stuffing validity in the entropy segment (every 0xFF inside it is
    followed by 0x00) — the container rules a third-party baseline decoder
    relies on."""
    import struct

    import numpy as np

    from wiki_mysql_spark.operators.multimodal import encode_jpeg

    px = np.random.default_rng(3).integers(0, 256, (20, 20, 3), dtype=np.uint8)
    b = encode_jpeg(px, quality=90)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    pos, seen = 2, []
    while True:
        marker = struct.unpack_from(">H", b, pos)[0]
        assert 0xFF01 <= marker <= 0xFFFE and (marker >> 8) == 0xFF
        if marker == 0xFFDA:
            seen.append(marker)
            length = struct.unpack_from(">H", b, pos + 2)[0]
            entropy = b[pos + 2 + length : -2]
            i = 0
            while i < len(entropy):
                if entropy[i] == 0xFF:
                    assert entropy[i + 1] == 0x00, "unstuffed 0xFF in entropy"
                    i += 2
                else:
                    i += 1
            break
        seen.append(marker)
        pos += 2 + struct.unpack_from(">H", b, pos + 2)[0]
    assert seen[0] == 0xFFE0  # JFIF APP0 first
    assert seen.count(0xFFDB) >= 2 and seen.count(0xFFC4) == 2
    assert 0xFFC0 in seen and seen.index(0xFFDB) < seen.index(0xFFC0) < seen.index(0xFFDA)


def test_jpeg_rejects_unsupported_shapes():
    import numpy as np
    import pytest as _pytest

    from wiki_mysql_spark.operators.multimodal import decode_jpeg, encode_jpeg

    with _pytest.raises(ValueError):
        decode_jpeg(b"BM not a jpeg")
    # lossless SOF3 must be rejected honestly, not mis-decoded
    # (SOF2/progressive is real as of r5 — covered by the identity test)
    px = np.zeros((8, 8), np.uint8)
    b = bytearray(encode_jpeg(px))
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC3
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(b))


def test_avi_mjpeg_codec_roundtrip():
    """The real MJPEG-AVI video codec: RIFF container walk + per-frame
    baseline-JPEG decode. Frame count/fps/dims exact; pixels within the
    JPEG lossy tolerance; non-AVI bytes rejected."""
    import numpy as np
    import pytest as _pytest

    from wiki_mysql_spark.operators.multimodal import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (12, 16, 3), dtype=np.uint8) for _ in range(6)]
    avi = encode_avi_mjpeg(frames, fps=24)
    fps, out = decode_avi_mjpeg(avi)
    assert fps == 24 and len(out) == 6
    assert all(o.shape == (12, 16, 3) for o in out)
    assert max(
        np.abs(o.astype(int) - f.astype(int)).max() for o, f in zip(out, frames)
    ) <= 32
    with _pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with _pytest.raises(ValueError):
        encode_avi_mjpeg([])


def test_sample_frames_real_video_path(spark):
    """sample_frames(fake=False) must decode real MJPEG AVIs and emit one
    standalone JPEG per sampled frame."""
    import numpy as np

    from wiki_mysql_spark.operators.multimodal import (
        decode_jpeg,
        encode_avi_mjpeg,
        sample_frames,
    )

    rng = np.random.default_rng(9)
    rows = []
    for doc_id in range(3):
        frames = [
            rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(5)
        ]
        rows.append((doc_id, bytearray(encode_avi_mjpeg(frames, fps=10))))
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    got = sample_frames(df, n_frames=2, fake=False).collect()
    assert len(got) == 6
    for r in got:
        img = decode_jpeg(bytes(r["frame"]))
        assert img.shape == (8, 8, 3)


def test_resize_png_and_jpeg_real_paths():
    """resize_image now covers all three real image codecs: decode ->
    nearest-neighbor -> re-encode in the same format; pixel-exact for the
    lossless formats, tolerance-bounded for JPEG."""
    import numpy as np

    from wiki_mysql_spark.operators.multimodal import (
        decode_jpeg,
        decode_png,
        encode_jpeg,
        encode_png,
        resize_image,
    )

    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    up = resize_image(encode_png(px), 18, 12)
    out = decode_png(up)
    assert out.shape == (12, 18, 3)
    # nearest-neighbor upsample through a LOSSLESS codec is pixel-exact
    yi, xi = (np.arange(12) * 6) // 12, (np.arange(18) * 9) // 18
    assert (out == px[yi][:, xi]).all()
    jout = decode_jpeg(resize_image(encode_jpeg(px, quality=95), 18, 12))
    assert jout.shape == (12, 18, 3)
    assert np.abs(
        jout.astype(int) - px[yi][:, xi].astype(int)
    ).max() <= 64  # double-lossy (encode -> resize path re-encodes)


def test_jpeg_codec_randomized_roundtrip_sweep():
    """100 seeded-random (shape, grayscale, quality) combinations through
    encode->decode: dims always exact, reconstruction error bounded by a
    quality-dependent envelope (worst-case random noise)."""
    import numpy as np

    from wiki_mysql_spark.operators.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(1234)
    for _ in range(100):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        gray = bool(rng.integers(0, 2))
        q = int(rng.choice([50, 75, 90, 95, 100]))
        shape = (h, w) if gray else (h, w, 3)
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(px, quality=q))
        assert dec.shape == px.shape
        # max-error envelopes measured over this seed with headroom; the
        # MEAN bound is the discriminator (a broken Huffman/IDCT path
        # yields mean ~85 on uniform noise, far outside every row)
        max_tol = {50: 230, 75: 160, 90: 64, 95: 40, 100: 8}[q]
        mean_tol = {50: 45, 75: 32, 90: 18, 95: 12, 100: 2}[q]
        err = np.abs(dec.astype(int) - px.astype(int))
        assert err.max() <= max_tol, (h, w, gray, q, int(err.max()))
        assert err.mean() <= mean_tol, (h, w, gray, q, float(err.mean()))


def test_pq_topk_invariants(spark):
    """PQ/ADC results must carry the EXACT cosine the brute-force path
    computes for the same pair (precision-1-after-verify, recall<1
    allowed), return exactly k rows per query ranked by ADC, and the
    codebooks must compress: m codes per vector, each from its own
    subspace's centroid ids."""
    from pyspark.sql import functions as F

    from wiki_mysql_spark.operators.similarity import (
        brute_force_topk,
        pq_codebooks,
        pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    approx = pq_topk(emb, q, k=5).collect()
    all_sims = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in brute_force_topk(emb, q, k=10**6).collect()
    }
    assert len(approx) == 15  # 3 queries x k=5 exactly
    for r in approx:
        assert all_sims[(r["query_id"], r["neighbor_id"])] == r["cos_sim"]
    by_q = {}
    for r in approx:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["adc_dist"]))
    for pairs in by_q.values():
        pairs.sort()
        assert [p[0] for p in pairs] == [1, 2, 3, 4, 5]
        assert [p[1] for p in pairs] == sorted(p[1] for p in pairs), \
            "rank must follow ADC distance"
    books = pq_codebooks(emb, m=4, n_centroids=8)
    assert len(books) == 4
    for book in books:
        assert 1 <= len(book) <= 8
        assert all(len(cv) == 16 for _, cv in book)  # 64/4 dims per subspace


def test_semdedup_invariants(spark):
    """SemDeDup: every vector appears exactly once; a vector is dropped
    iff some SAME-CLUSTER lower-id vector is cosine-similar above the
    threshold (verified against an independently computed truth from the
    exact pair set); lowest id in any near-dup pair always survives."""
    from pyspark.sql import functions as F

    from wiki_mysql_spark.operators.similarity import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semdedup(emb, threshold=0.3, n_centroids=4, n_iters=1).collect()
    n = emb.count()
    assert len(out) == n
    cells = {r["vec_id"]: r["cell"] for r in out}
    keep = {r["vec_id"]: r["keep"] for r in out}
    # independent truth: exact cosine over all pairs, restricted to cells
    from wiki_mysql_spark.operators.dedup import embedding_near_dup_pairs

    pairs = embedding_near_dup_pairs(emb, threshold=0.3).collect()
    should_drop = {
        r["id_b"] for r in pairs if cells[r["id_a"]] == cells[r["id_b"]]
    }
    got_drop = {v for v, k in keep.items() if not k}
    assert got_drop == should_drop
    # the lowest id of every same-cell near-dup pair survives
    for r in pairs:
        if cells[r["id_a"]] == cells[r["id_b"]] and r["id_a"] not in should_drop:
            assert keep[r["id_a"]]


def test_pq_and_semdedup_deterministic(spark):
    """Retrain-identical determinism for the two cluster-trained r4
    operators: codebooks, PQ results, and SemDeDup keep-sets must be
    byte-identical across reruns (the rounded arithmetic pins every
    fixpoint; partition placement must not leak into results)."""
    from pyspark.sql import functions as F

    from wiki_mysql_spark.operators.similarity import (
        pq_codebooks,
        pq_topk,
        semdedup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    b1 = pq_codebooks(emb, m=4, n_centroids=8)
    b2 = pq_codebooks(emb.repartition(7), m=4, n_centroids=8)
    assert b1 == b2
    q = emb.where(F.col("vec_id") < 3)
    r1 = sorted(map(tuple, pq_topk(emb, q, k=5).collect()))
    r2 = sorted(map(tuple, pq_topk(emb.repartition(5), q, k=5).collect()))
    assert r1 == r2
    s1 = sorted(map(tuple, semdedup(emb, threshold=0.3, n_centroids=4,
                                    n_iters=1).collect()))
    s2 = sorted(map(tuple, semdedup(emb.repartition(9), threshold=0.3,
                                    n_centroids=4, n_iters=1).collect()))
    assert s1 == s2


def test_avi_container_structure_independent_parse():
    """Walk the emitted AVI with an independent minimal RIFF parser: the
    hdrl/movi/idx1 lists in order, a full 56-byte stream header, one
    00dc chunk per frame with word alignment, and idx1 entries whose
    offsets resolve to the actual frame chunks."""
    import struct

    import numpy as np

    from wiki_mysql_spark.operators.multimodal import encode_avi_mjpeg

    frames = [
        np.random.default_rng(i).integers(0, 256, (8, 8, 3), dtype=np.uint8)
        for i in range(5)
    ]
    b = encode_avi_mjpeg(frames, fps=12)
    assert b[:4] == b"RIFF" and b[8:12] == b"AVI "
    assert struct.unpack_from("<I", b, 4)[0] == len(b) - 8
    pos, lists, frames_seen, idx = 12, [], [], None
    while pos + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, pos)
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"LIST":
            lists.append(body[:4])
            if body[:4] == b"movi":
                mpos = 4
                while mpos + 8 <= len(body):
                    mcid, msize = struct.unpack_from("<4sI", body, mpos)
                    if mcid == b"00dc":
                        frames_seen.append((mpos, msize))
                        assert body[mpos + 8 : mpos + 10] == b"\xff\xd8"
                    mpos += 8 + msize + (msize & 1)  # word alignment
            if body[:4] == b"hdrl":
                # strh must be the full 56-byte AVIStreamHeader
                i = body.find(b"strh")
                strh_size = struct.unpack_from("<I", body, i + 4)[0]
                assert strh_size == 56
                assert body[i + 8 : i + 12] == b"vids"
                assert body[i + 12 : i + 16] == b"MJPG"
        elif cid == b"idx1":
            idx = [
                struct.unpack_from("<4sIII", body, k)
                for k in range(0, size, 16)
            ]
        pos += 8 + size + (size & 1)
    assert lists[0] == b"hdrl" and b"movi" in lists
    assert len(frames_seen) == 5 and idx is not None and len(idx) == 5
    # idx offsets point at the corresponding 00dc chunk headers
    for (ckid, _, off, sz), (mpos, msize) in zip(idx, frames_seen):
        assert ckid == b"00dc" and off == mpos and sz == msize


def test_derived_n_centroids_bounds_mean_cell():
    """The SemDeDup cluster-count scaling: mean cell size stays at or
    under target for any corpus size between the clamps, and k clamps at
    both ends (r4 verdict item 1 — a fixed k re-grows the quadratic)."""
    from wiki_mysql_spark.operators.similarity import derived_n_centroids

    for n in (1, 100, 512, 513, 2000, 64_000, 100_000, 262_144):
        k = derived_n_centroids(n, target_cell_rows=64)
        if 8 * 64 <= n <= 4096 * 64:
            assert n / k <= 64, (n, k)
        assert 8 <= k <= 4096
    assert derived_n_centroids(10, target_cell_rows=64) == 8  # floor clamp
    assert derived_n_centroids(10**9, target_cell_rows=64) == 4096  # cap
    assert derived_n_centroids(2000, target_cell_rows=64) == 32
    assert derived_n_centroids(500, target_cell_rows=64) == 8


def _rand_emb_df(spark, n, dim=16, seed=7, id_offset=0):
    import random

    rng = random.Random(seed)
    rows = [
        (i + id_offset, [round(rng.gauss(0, 1), 3) for _ in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semdedup_cell_size_stays_bounded_as_corpus_grows(spark):
    """Growing the corpus 4x must grow the derived k so that the maximum
    cell stays within the skew gate (32 x target) — the property that
    keeps within-cell work O(n) at 100x data."""
    from wiki_mysql_spark.operators.similarity import semdedup

    for n in (256, 1024):
        out = semdedup(
            _rand_emb_df(spark, n), threshold=0.95, n_iters=1,
            target_cell_rows=16,
        )
        sizes = [
            r["c"]
            for r in out.groupBy("cell").agg(F.count(F.lit(1)).alias("c")).collect()
        ]
        assert sum(sizes) == n
        assert max(sizes) <= 32 * 16  # the gate would have raised otherwise


def test_semdedup_hot_cell_gate_refuses(spark):
    """An adversarial corpus (every vector identical -> one hot cell) must
    be REFUSED, not silently run near-quadratically — the same posture as
    embedding_near_dup_pairs' byte gate."""
    import pytest

    from wiki_mysql_spark.operators.similarity import semdedup

    rows = [(i, [1.0] * 16) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="max_cell_rows"):
        semdedup(emb, threshold=0.3, n_iters=1, target_cell_rows=2,
                 max_cell_rows=64)


def test_embedding_near_dup_pairs_empty_corpus(spark):
    """Empty corpus -> empty (id_a, id_b, cos_sim) frame, not an
    IndexError on the collapsed (0,) numpy array."""
    from wiki_mysql_spark.operators.dedup import embedding_near_dup_pairs

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = embedding_near_dup_pairs(emb, threshold=0.3)
    assert out.columns == ["id_a", "id_b", "cos_sim"]
    assert out.count() == 0


def test_codebook_training_rejects_empty_and_handles_sparse_ids(spark):
    """Empty corpus -> clear ValueError (not a silent empty codebook);
    sparse/offset ids -> the SAME centroid geometry as dense ids (seeding
    is by id order, not `id < k`)."""
    import pytest

    from wiki_mysql_spark.operators.similarity import (
        kmeans_codebook,
        pq_codebooks,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        pq_codebooks(empty, m=4, n_centroids=4, dim=16)
    with pytest.raises(ValueError, match="empty"):
        kmeans_codebook(empty, n_centroids=4)

    dense = _rand_emb_df(spark, 64, dim=16, seed=11)
    sparse = _rand_emb_df(spark, 64, dim=16, seed=11, id_offset=1000)
    bd = pq_codebooks(dense, m=4, n_centroids=4, dim=16)
    bs = pq_codebooks(sparse, m=4, n_centroids=4, dim=16)
    # same vectors, shifted ids: centroid VALUES must match exactly
    assert [[cv for _, cv in book] for book in bd] == \
        [[cv for _, cv in book] for book in bs]


def test_jpeg_16bit_quant_tables_decode():
    """DQT precision=1 (16-bit big-endian entries): rewrite the encoder's
    8-bit tables as 16-bit with identical values — the decode must be
    bit-identical to the 8-bit stream's."""
    import struct

    import numpy as np

    from wiki_mysql_spark.operators.multimodal import decode_jpeg, encode_jpeg

    px = np.random.default_rng(5).integers(0, 256, (24, 16, 3), dtype=np.uint8)
    b = encode_jpeg(px, quality=95)
    out = bytearray()
    pos = 0
    while pos < len(b):
        if b[pos : pos + 2] == b"\xff\xdb":
            length = struct.unpack_from(">H", b, pos + 2)[0]
            body = b[pos + 4 : pos + 2 + length]
            tq = body[0] & 0xF
            nb = bytes([0x10 | tq]) + b"".join(
                struct.pack(">H", v) for v in body[1:65]
            )
            out += struct.pack(">HH", 0xFFDB, len(nb) + 2) + nb
            pos += 2 + length
        else:
            out.append(b[pos])
            pos += 1
    assert (decode_jpeg(bytes(out)) == decode_jpeg(b)).all()


def test_jpeg_progressive_bit_identical_to_baseline():
    """Progressive (SOF2) decode must be BIT-IDENTICAL to baseline decode
    of the same quantized coefficients — the strongest possible oracle for
    the Annex-G scan machinery (DC/AC first + refinement, EOB runs,
    correction-bit buffering): any slip anywhere breaks equality."""
    import numpy as np

    from wiki_mysql_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(99)
    for h, w, gray, q in [
        (8, 8, False, 95), (16, 12, False, 95), (17, 9, False, 90),
        (1, 1, False, 95), (5, 40, True, 95), (64, 64, False, 75),
        (24, 24, True, 50), (33, 31, False, 100), (40, 56, False, 95),
    ]:
        shape = (h, w) if gray else (h, w, 3)
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(px, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(px, quality=q))
        assert (base == prog).all(), (h, w, gray, q)
    # seeded randomized sweep across shapes/qualities
    r2 = np.random.default_rng(7)
    for _ in range(40):
        h, w = int(r2.integers(1, 48)), int(r2.integers(1, 48))
        gray = bool(r2.integers(0, 2))
        q = int(r2.choice([50, 75, 90, 95, 100]))
        shape = (h, w) if gray else (h, w, 3)
        px = r2.integers(0, 256, shape, dtype=np.uint8)
        assert (
            decode_jpeg(encode_jpeg(px, quality=q))
            == decode_jpeg(encode_jpeg_progressive(px, quality=q))
        ).all(), (h, w, gray, q)


def test_nearest_cell_literal_and_arrow_paths_identical(spark):
    """The two physical strategies for nearest-center assignment (inlined
    literal expression for small k, Arrow-blocked numpy for large k) must
    produce byte-identical assignments — the blocked path accumulates
    dimension-by-dimension in the same fold order, and argmax over
    id-sorted centers reproduces the ties→lower-id rule."""
    import random

    from wiki_mysql_spark.operators.similarity import (
        kmeans_codebook,
        with_nearest_cell,
    )

    rng = random.Random(3)
    rows = [
        (i, [round(rng.gauss(0, 1), 3) for _ in range(16)]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    book = kmeans_codebook(df, n_centroids=80, n_iters=1)
    lit = with_nearest_cell(
        df, book, vec_col="embedding", literal_k_max=1000
    )
    arw = with_nearest_cell(
        df, book, vec_col="embedding", literal_k_max=8
    )
    a = sorted((r["vec_id"], r["cell"]) for r in lit.collect())
    b = sorted((r["vec_id"], r["cell"]) for r in arw.collect())
    assert a == b


def test_wav_float_and_g711_formats_decode():
    """WAV format coverage beyond PCM16 (r5): IEEE-float32 (format 3)
    round-trips exactly; G.711 A-law/mu-law (formats 6/7) expand against
    canonical ITU table values (mu 0x00 -> -32124, 0x80 -> +32124,
    0xFF -> 0; A 0xD5 -> +8, 0x55 -> -8, 0xAA -> +32256, 0x2A -> -32256)
    and every segment boundary is monotone; unsupported combos refuse."""
    import struct

    import numpy as np
    import pytest as _pytest

    from wiki_mysql_spark.operators.multimodal import (
        _g711_alaw_decode,
        _g711_mulaw_decode,
        decode_wav,
    )

    def wav(fmt_code, bits, data, rate=8000, ch=1):
        block = ch * bits // 8
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, fmt_code, ch, rate,
                                    rate * block, block, bits)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    # float32 exact round-trip
    x = np.array([0.0, 0.5, -1.0, 0.25, 1.0], dtype="<f4")
    rate, ch, s = decode_wav(wav(3, 32, x.tobytes()))
    assert rate == 8000 and ch == 1 and (s[:, 0] == x).all()

    # canonical G.711 values
    mu = _g711_mulaw_decode(np.array([0x00, 0x80, 0xFF, 0x7F], dtype=np.uint8))
    assert mu.tolist() == [-32124, 32124, 0, 0]
    al = _g711_alaw_decode(np.array([0xD5, 0x55, 0xAA, 0x2A], dtype=np.uint8))
    assert al.tolist() == [8, -8, 32256, -32256]
    # mu-law decode is monotone over the positive half (codes 0xFF..0x80)
    pos = _g711_mulaw_decode(np.arange(0xFF, 0x7F, -1, dtype=np.uint8))
    assert (np.diff(pos.astype(int)) > 0).all()
    # A-law positive half: 0xD5 (smallest +) .. each segment increases
    apos = _g711_alaw_decode(
        np.array([c ^ 0x55 for c in range(0x80, 0x100)], dtype=np.uint8)
    )
    assert (np.diff(np.sort(apos.astype(int))) >= 0).all() and apos.min() == 8

    # through the WAV container
    codes = bytes([0x00, 0x80, 0xFF])
    _, _, smu = decode_wav(wav(7, 8, codes))
    assert smu[:, 0].tolist() == [-32124, 32124, 0]
    _, _, sal = decode_wav(wav(6, 8, bytes([0xD5, 0x55])))
    assert sal[:, 0].tolist() == [8, -8]

    with _pytest.raises(NotImplementedError):
        decode_wav(wav(1, 8, b"\x00"))  # 8-bit PCM not claimed
    with _pytest.raises(NotImplementedError):
        decode_wav(wav(2, 4, b"\x00"))  # ADPCM not claimed


def test_ivfpq_topk_invariants(spark):
    """IVFADC acceptance (r5 verdict #2): (a) every returned candidate's
    exact-cosine verifier equals the brute-force value, (b) every returned
    neighbor lives in one of that query's probed coarse cells (candidates
    come ONLY from probed cells), (c) within each query the ADC ranking is
    monotone in adc_dist with neighbor-id tie-break."""
    from wiki_mysql_spark.operators.similarity import (
        ivfpq_topk,
        nearest_cells,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    # coarse_iters=0 = the untrained first-8-by-id quantizer, so the
    # hand-recomputed assignments below stay a closed-form check; the
    # trained default's quality claim lives in
    # test_ivfpq_recall_high_on_clustered_data
    out = ivfpq_topk(
        emb, q, k=10, n_coarse=8, n_probe=2, m=4, n_centroids=8,
        coarse_iters=0,
    )
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2, 3, 4}

    # (a) exact-cosine verifier matches brute force for every returned pair
    all_sims = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in brute_force_topk(emb, q, k=10**6).collect()
    }
    for r in rows:
        assert all_sims[(r["query_id"], r["neighbor_id"])] == r["cos_sim"]

    # (b) subset-of-probed-cells: recompute assignments + probes directly
    seeds = (
        emb.orderBy("vec_id").limit(8)
        .select(F.col("vec_id").cast("long").alias("cid"), "embedding")
        .collect()
    )
    coarse = sorted((int(r["cid"]), [float(x) for x in r["embedding"]]) for r in seeds)
    cells = {
        r["vec_id"]: r["cell"]
        for r in emb.select(
            "vec_id",
            F.element_at(nearest_cells(F.col("embedding"), coarse, 1), 1).alias(
                "cell"
            ),
        ).collect()
    }
    probed = {
        r["vec_id"]: set(r["cells"])
        for r in q.select(
            "vec_id", nearest_cells(F.col("embedding"), coarse, 2).alias("cells")
        ).collect()
    }
    for r in rows:
        assert cells[r["neighbor_id"]] in probed[r["query_id"]], r

    # (c) rank is the (adc, neighbor_id) order, dense from 1
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(r["adc_dist"], r["neighbor_id"]) for r in rs]
        assert keys == sorted(keys)


def test_threshold_on_raw_similarity_not_rounded(spark):
    """Similarity thresholds must apply to the RAW value, rounding only for
    display: a raw value in [t - 5e-7, t) rounds UP to t and would slip
    through a rounded-value filter, but the SQL oracles (and the exact
    definition) threshold raw. Regression for the r6 review finding on
    embedding_lsh_pairs / ngram_jaccard_pairs / minhash jaccard."""
    import numpy as np

    from wiki_mysql_spark.operators.dedup import (
        embedding_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from wiki_mysql_spark.operators.similarity import _hyperplanes

    # --- embedding path: cosine exactly 2.5e-7 below the threshold --------
    t = 0.25
    c0 = t - 2.5e-7  # rounds to 0.250000 at 6 digits, raw < t
    va = [1.0, 0.0]
    vb = [c0, float(np.sqrt(1.0 - c0 * c0))]
    # pick a deterministic seed whose single hyperplane puts both vectors on
    # the same side — the pair is then an LSH CANDIDATE and only the cosine
    # filter decides (the search is itself deterministic)
    seed = next(
        s for s in range(100)
        if np.sign(np.dot(_hyperplanes(2, 1, s)[0], va))
        == np.sign(np.dot(_hyperplanes(2, 1, s)[0], vb))
    )
    emb = spark.createDataFrame(
        [(0, va), (1, vb)], "vec_id long, embedding array<double>"
    )
    kwargs = dict(dim=2, n_planes=1, n_bands=1, seed=seed)
    # sanity: the pair IS a candidate (drops out at a permissive threshold)
    assert embedding_lsh_pairs(emb, threshold=0.2, **kwargs).count() == 1
    # boundary: raw < t excludes it even though round(raw, 6) == t
    assert embedding_lsh_pairs(emb, threshold=t, **kwargs).count() == 0

    # --- n-gram jaccard path: raw 2/3, threshold between raw and rounded --
    # A={abc,bcd,cde}, B={abc,bcd}: jaccard = 2/3 = 0.66666...; round(.,6)
    # = 0.666667 >= 0.6666667 > raw — a rounded filter admits, raw rejects
    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d")], "doc_id long, text string"
    )
    assert ngram_jaccard_pairs(docs, threshold=0.6).count() == 1
    assert ngram_jaccard_pairs(docs, threshold=0.6666667).count() == 0


def test_lsh_multi_probe_dominates_single_probe(spark):
    """probe_bits=1 only ADDS candidate buckets (the query's own bucket is
    always probed), so per query: at least as many results, and a rank-1
    similarity at least as good. Radius > 1 is an explicit error."""
    from wiki_mysql_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    single = lsh_topk(emb, q, k=5).collect()
    multi = lsh_topk(emb, q, k=5, probe_bits=1).collect()

    def best(rows):
        out = {}
        for r in rows:
            cur = out.get(r["query_id"])
            if cur is None or r["cos_sim"] > cur:
                out[r["query_id"]] = r["cos_sim"]
        return out

    sb, mb = best(single), best(multi)
    from collections import Counter

    sn, mn = Counter(r["query_id"] for r in single), Counter(
        r["query_id"] for r in multi
    )
    for qid in sb:
        assert mb[qid] >= sb[qid]
        assert mn[qid] >= sn[qid]
    with pytest.raises(ValueError):
        lsh_topk(emb, q, k=5, probe_bits=2)


def test_lsh_multi_table_dominates_single_table(spark):
    """OR-amplification (r7): n_tables=2 candidates are a superset of
    n_tables=1's (table 0 uses the same seed either way), so per query the
    2-table result has at least as many rows and a rank-1 similarity at
    least as good; pairs meeting in both tables are deduped (no duplicate
    (query, neighbor) rows); n_tables=0 is an explicit error."""
    from collections import Counter

    from wiki_mysql_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    one = lsh_topk(emb, q, k=5, probe_bits=1).collect()
    two = lsh_topk(emb, q, k=5, probe_bits=1, n_tables=2).collect()

    assert len({(r["query_id"], r["neighbor_id"]) for r in two}) == len(two)

    def best(rows):
        out = {}
        for r in rows:
            cur = out.get(r["query_id"])
            if cur is None or r["cos_sim"] > cur:
                out[r["query_id"]] = r["cos_sim"]
        return out

    b1, b2 = best(one), best(two)
    n1 = Counter(r["query_id"] for r in one)
    n2 = Counter(r["query_id"] for r in two)
    for qid in b1:
        assert b2[qid] >= b1[qid]
        assert n2[qid] >= n1[qid]
    with pytest.raises(ValueError):
        lsh_topk(emb, q, k=5, n_tables=0)


def test_pq_recall_high_on_clustered_data(spark):
    """The ANN recall artifact shows low PQ recall on the near-isotropic
    synthetic fixture — this pins that the limit is the DATA, not the ADC
    machinery: on clustered vectors (200 tight clusters x 10 members) PQ
    recovers the query's cluster-mates, mean recall@9 >= 0.7."""
    import numpy as np

    from wiki_mysql_spark.operators.similarity import brute_force_topk, pq_topk

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(200, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(10):
            v = c + rng.normal(scale=0.01, size=64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") % 200 == 0).limit(10)
    k = 9  # a query's cluster-mates
    exact, approx = {}, {}
    for r in brute_force_topk(emb, q, k=k).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in pq_topk(emb, q, k=k, m=4, n_centroids=8).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(approx.get(qid, set()) & s) / k for qid, s in exact.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_ivfpq_recall_high_on_clustered_data(spark):
    """The r6 verdict's acceptance bar for the IVFADC fix: at the shipped
    operating point (TRAINED coarse quantizer, m=8/k'=16 residual codes)
    IVFPQ must recover >= 0.7 of the true top-k on clustered vectors —
    the r6 point (untrained coarse, 12-bit codes) returned essentially
    random neighbors (recall@10 = 0.009). 50 tight clusters x 10 members;
    coarse k=16 so cells hold a few clusters each and residuals are
    cluster-offsets — the regime residual PQ is built for."""
    import numpy as np

    from wiki_mysql_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
    )

    rng = np.random.default_rng(13)
    centers = rng.normal(size=(50, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(10):
            v = c + rng.normal(scale=0.01, size=64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") % 50 == 0).limit(10)
    k = 9  # a query's cluster-mates
    exact, approx = {}, {}
    for r in brute_force_topk(emb, q, k=k).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # the SHIPPED operating point (r8: the measured frontier's knee —
    # n_coarse=16, n_probe=2; ANN_RECALL_r8.json ivfpq_frontier)
    out = ivfpq_topk(
        emb, q, k=k, n_coarse=16, n_probe=2, m=8, n_centroids=16,
        coarse_iters=2,
    )
    for r in out.collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(approx.get(qid, set()) & s) / k for qid, s in exact.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_codebook_driver_and_distributed_paths_agree(spark):
    """The driver_train_bytes byte gate picks the PHYSICAL training
    strategy only (the FAISS sample-training posture under the gate, the
    distributed Lloyd/PQ jobs past it): both paths must produce the SAME
    codebooks and the same IVFADC output on one fixture — the empirical
    backing for the numpy-twin bit-equality argument (dimension-ordered
    folds + HALF_UP round twin, functions/vectors.py)."""
    from wiki_mysql_spark.operators.similarity import (
        ivfpq_topk,
        kmeans_codebook,
        pq_codebooks,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    k_driver = kmeans_codebook(emb, n_centroids=8, n_iters=2)
    k_dist = kmeans_codebook(emb, n_centroids=8, n_iters=2, driver_train_bytes=0)
    assert k_driver == k_dist

    b_driver = pq_codebooks(emb, m=8, n_centroids=16)
    b_dist = pq_codebooks(emb, m=8, n_centroids=16, driver_train_bytes=0)
    assert b_driver == b_dist

    q = emb.where(F.col("vec_id") < 3)
    out_driver = sorted(
        map(tuple, ivfpq_topk(emb, q, k=5, n_coarse=8, n_probe=2).collect())
    )
    out_dist = sorted(
        map(
            tuple,
            ivfpq_topk(
                emb, q, k=5, n_coarse=8, n_probe=2, driver_train_bytes=0
            ).collect(),
        )
    )
    assert out_driver == out_dist


def test_fits_driver_byte_gate_rejects_wide_unknown_stats_corpus(spark):
    """r8 advice (medium): _fits_driver must byte-probe unknown-stats
    corpora. Vector width is caller-controlled, so a rows-only check would
    collect e.g. 100k x 1024-dim float64 rows (~800 MB) to the driver far
    past _DRIVER_TRAIN_BYTES. Pin: a NARROW-count but WIDE-row frame with
    unknown leaf stats (RDD-backed strips LocalRelation's exact sizing)
    stays OUT of the driver path; the same frame with thin rows stays in."""
    from pyspark.sql import Row

    from wiki_mysql_spark.operators.similarity import _fits_driver

    def rdd_backed(dim):
        # via the RDD so the optimizer sees unknown leaf stats (a python
        # createDataFrame lands as a size-known LocalRelation)
        rows = [Row(vec_id=i, embedding=[float(i)] * dim) for i in range(64)]
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows),
            "vec_id long, embedding array<double>",
        )

    gate = 64 << 10  # 64 KB for a fast test; the production gate is 64 MB
    # 64 rows x 4096 doubles ~ 4 MB estimated >> 64 KB: must be rejected
    assert not _fits_driver(rdd_backed(4096), "vec_id", "embedding", gate)
    # 64 rows x 8 doubles ~ 9 KB estimated << 64 KB: still admitted
    assert _fits_driver(rdd_backed(8), "vec_id", "embedding", gate)


def test_bigram_lm_scores_hand_computed(spark):
    """The perplexity filter's LM semantics against hand arithmetic:
    reference 'a b a c' gives c1={a:2,b:1,c:1}, V=3, bigram counts
    {'a b':1,'b a':1,'a c':1}; add-one scoring of 'a b c' is
    ln(2/5), ln(1/4) — scaled-integer sums must match exactly; a doc
    identical to the reference scores above the corpus mean (keep),
    the novel doc below it (drop); a doc with <2 alpha tokens is
    unscorable (n_bigrams=0, keep=false, avg NULL)."""
    import math

    from pyspark.sql import functions as F

    from wiki_mysql_spark.operators.lm import bigram_lm_scores

    docs = spark.createDataFrame(
        [
            (1, "src0", "a b a c"),
            (2, "web", "a b c"),
            (3, "web", "zz1 42 !!"),
            (4, "web", "a b a c"),
        ],
        ["doc_id", "source", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in bigram_lm_scores(
            docs, ref_cond=F.col("source") == "src0"
        ).collect()
    }
    lp = lambda num, den: round(math.log(num / den) * 1_000_000)
    ref_sum = lp(2, 5) + lp(2, 4) + lp(2, 5)       # a b | b a | a c
    novel_sum = lp(2, 5) + lp(1, 4)                # a b | b c (unseen)
    assert rows[1]["lp_sum"] == ref_sum and rows[1]["n_bigrams"] == 3
    assert rows[4]["lp_sum"] == ref_sum            # identical text, same score
    assert rows[2]["lp_sum"] == novel_sum and rows[2]["n_bigrams"] == 2
    assert rows[3]["n_bigrams"] == 0 and rows[3]["lp_sum"] == 0
    assert rows[3]["avg_logprob"] is None and rows[3]["keep"] is False
    # head/tail split around the corpus mean: the reference-like docs
    # keep, the novel one drops
    assert rows[1]["keep"] and rows[4]["keep"] and not rows[2]["keep"]


def test_bigram_lm_scores_empty_reference_raises(spark):
    """r12 advice: an empty reference slice (V=0, all n1=0) makes the
    add-one denominator 0, where Spark's non-ANSI Divide yields NULL and
    DuckDB's IEEE division yields inf — silent engine divergence. The
    operator must refuse loudly instead."""
    import pytest
    from pyspark.sql import functions as F

    from wiki_mysql_spark.operators.lm import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "web", "a b c"), (2, "web", "d e f")],
        ["doc_id", "source", "text"],
    )
    with pytest.raises(ValueError, match="reference vocabulary is empty"):
        bigram_lm_scores(docs, ref_cond=F.col("source") == "src0")
    # a reference slice with no SCORABLE tokens (nothing alphabetic)
    # is just as empty
    docs2 = spark.createDataFrame(
        [(1, "src0", "42 !! 7"), (2, "web", "a b c")],
        ["doc_id", "source", "text"],
    )
    with pytest.raises(ValueError, match="reference vocabulary is empty"):
        bigram_lm_scores(docs2, ref_cond=F.col("source") == "src0")
