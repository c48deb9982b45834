"""E2E smoke for the wiki pipeline (SURVEY.md §5.4): synthetic mediawiki XML
-> read_wiki_dump -> build_wiki_tables -> exact articles/bodies contents."""

from __future__ import annotations

import os
import textwrap

import pytest
from pyspark.sql import functions as F

from wiki_mysql_spark.operators.ids import dense_ids
from wiki_mysql_spark.plans.wiki_pipeline import build_wiki_tables
from wiki_mysql_spark.sources.wikixml import read_wiki_dump

WIKI_XML = textwrap.dedent(
    """\
    <mediawiki>
      <page>
        <title>Alpha</title><ns>0</ns><id>1</id>
        <revision><text>Alpha body with a [[Beta|link]] and {{tmpl}} markup.</text></revision>
      </page>
      <page>
        <title>Beta</title><ns>0</ns><id>2</id>
        <revision><text>Beta body &amp; more.</text></revision>
      </page>
      <page>
        <title>Alpha redirect</title><ns>0</ns><id>3</id>
        <redirect title="Alpha"/>
        <revision><text>#REDIRECT [[Alpha]]</text></revision>
      </page>
      <page>
        <title>Chain start</title><ns>0</ns><id>4</id>
        <revision><text>#REDIRECT [[Alpha redirect]]</text></revision>
      </page>
      <page>
        <title>Cycle one</title><ns>0</ns><id>5</id>
        <revision><text>#REDIRECT [[Cycle two]]</text></revision>
      </page>
      <page>
        <title>Cycle two</title><ns>0</ns><id>6</id>
        <revision><text>#REDIRECT [[Cycle one]]</text></revision>
      </page>
      <page>
        <title>Dangler</title><ns>0</ns><id>7</id>
        <revision><text>#REDIRECT [[Nowhere]]</text></revision>
      </page>
      <page>
        <title>Template:Skip me</title><ns>10</ns><id>8</id>
        <revision><text>not namespace 0</text></revision>
      </page>
    </mediawiki>
    """
)


@pytest.fixture(scope="module")
def wiki_tables(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("wikixml") / "dump.xml"
    path.write_text(WIKI_XML)
    pages = read_wiki_dump(spark, str(path))
    articles, bodies = build_wiki_tables(pages)
    return pages, articles.collect(), bodies.collect()


def test_namespace_filter(spark, wiki_tables):
    pages, _, _ = wiki_tables
    assert pages.count() == 7  # ns=10 page dropped at the scan


def test_bodies_cleaned(wiki_tables):
    _, _, bodies = wiki_tables
    by_body = {r["body"]: r["id"] for r in bodies}
    assert "Alpha body with a link and markup." in by_body
    assert "Beta body & more." in by_body
    assert len(bodies) == 2  # only non-redirect ns-0 pages get bodies


def test_articles_share_target_body(wiki_tables):
    _, articles, bodies = wiki_tables
    bid = {r["title"]: r["body"] for r in articles}
    # direct articles
    assert set(bid) == {"Alpha", "Beta", "Alpha redirect", "Chain start"}
    # redirect + chain share Alpha's body row (README.md:49-54 semantics)
    assert bid["Alpha redirect"] == bid["Alpha"]
    assert bid["Chain start"] == bid["Alpha"]
    # cycle + dangling pages produce no article row (dbfy.py:118-121,161-166)
    # ids are dense 1..N
    ids = sorted(r["id"] for r in articles)
    assert ids == list(range(1, len(articles) + 1))
    body_ids = sorted(r["id"] for r in bodies)
    assert body_ids == list(range(1, len(bodies) + 1))


def test_aid_preserved(wiki_tables):
    _, articles, _ = wiki_tables
    aid = {r["title"]: r["aid"] for r in articles}
    assert aid == {"Alpha": 1, "Beta": 2, "Alpha redirect": 3, "Chain start": 4}


def test_dense_ids_deterministic_and_dense(spark):
    df = spark.createDataFrame(
        [(c, i) for i, c in enumerate("zyxwvutsrq")], ["k", "v"]
    ).repartition(4)
    out = dense_ids(df, ["k"], id_col="id").orderBy("id").collect()
    assert [r["k"] for r in out] == sorted("zyxwvutsrq")
    assert [r["id"] for r in out] == list(range(1, 11))
    # caller-hinted small path (skips the gate's checkpoint + probe jobs)
    # must be row-identical to the self-probed decision
    hinted = dense_ids(df, ["k"], id_col="id", small_hint=True).orderBy(
        "id"
    ).collect()
    assert hinted == out


def test_bz2_dump_reads_identically(spark, tmp_path):
    """S2: .bz2 dumps decompress transparently (splittable Hadoop codec)."""
    import bz2

    plain = tmp_path / "d.xml"
    compressed = tmp_path / "d.xml.bz2"
    plain.write_text(WIKI_XML)
    compressed.write_bytes(bz2.compress(WIKI_XML.encode()))
    a = read_wiki_dump(spark, str(plain)).orderBy("aid").collect()
    b = read_wiki_dump(spark, str(compressed)).orderBy("aid").collect()
    assert a == b and len(a) == 7


def test_etl_disk_materialization_identical(spark, tmp_path):
    """The byte-gated disk materialization (r7 — the 24M-page OOM fix):
    materialize='disk' stages the raw parse and the cleaned+numbered
    frame as temp parquet instead of block-manager checkpoints. Results
    must be byte-identical to the memory path, the scratch dirs must be
    gone afterwards, and a bogus mode must fail loudly."""
    import bz2

    import pytest as _pytest

    from wiki_mysql_spark.plans.wiki_pipeline import run_wiki_etl

    dump = tmp_path / "d.xml.bz2"
    dump.write_bytes(bz2.compress(WIKI_XML.encode()))

    outs = {}
    for mode in ("memory", "disk"):
        out = tmp_path / f"out_{mode}"
        counts = run_wiki_etl(spark, str(dump), str(out), materialize=mode)
        arts = sorted(
            map(tuple, spark.read.parquet(f"{out}/articles").collect())
        )
        bods = sorted(
            map(tuple, spark.read.parquet(f"{out}/bodies").collect())
        )
        outs[mode] = (counts, arts, bods)
        assert not [
            d for d in os.listdir(out) if d.startswith("_mat_")
        ], "scratch materialization dirs must be cleaned up"
    assert outs["memory"] == outs["disk"]

    with _pytest.raises(ValueError, match="materialize"):
        run_wiki_etl(
            spark, str(dump), str(tmp_path / "out_bad"), materialize="bogus"
        )


def test_fetch_stage_roundtrip(tmp_path):
    from wiki_mysql_spark.sources.fetch import (
        check_dump_url,
        cleanup_dump,
        download_dump,
    )

    p = tmp_path / "x.xml.bz2"
    p.write_bytes(b"data")
    # file:// and bare paths short-circuit, never deleted (dbfy.py:88-91,100-102)
    path, rm = download_dump(f"file://{p}")
    assert path == str(p) and rm is False
    cleanup_dump(path, rm)
    assert p.exists()
    assert download_dump(str(p)) == (str(p), False)
    assert check_dump_url("https://dumps.wikimedia.org/enwiki-pages.xml.bz2")
    assert not check_dump_url("ftp://x/y.xml.bz2")
    assert not check_dump_url("https://x/y.zip")
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        download_dump("/nonexistent/dump.xml")


def test_cli_flag_parity_limit_and_unicode(spark, tmp_path):
    """Reference CLI parity: --limit caps pages exact-n; --valid/invalid
    unichr ranges (hex or decimal, inclusive) reach the cleaning chain."""
    from wiki_mysql_spark.plans.wiki_pipeline import (
        parse_unichr_range,
        run_wiki_etl,
    )

    # the reference's range format (dbfy.py:19-30)
    assert parse_unichr_range("0x2466,0x2588") == (0x2466, 0x2588)
    assert parse_unichr_range("65,90") == (65, 90)

    dump = tmp_path / "mini.xml"
    pages = "".join(
        f"<page><title>P{i}</title><ns>0</ns><id>{i}</id>"
        f"<revision><text>abc XYZ {i} ⑧ end</text></revision></page>"
        for i in range(6)
    )
    dump.write_text(f"<mediawiki>{pages}</mediawiki>")

    counts = run_wiki_etl(
        spark,
        str(dump),
        str(tmp_path / "out"),
        limit=4,
        # blacklist the circled-digit block: U+2467 must vanish
        invalid_unicodes=((0x2460, 0x24FF),),
    )
    assert counts == {"articles": 4, "bodies": 4, "quarantine": 0}
    bodies = spark.read.parquet(str(tmp_path / "out" / "bodies"))
    texts = [r["body"] for r in bodies.collect()]
    assert all("⑧" not in t for t in texts)
    assert all("abc XYZ" in t for t in texts)


def test_global_ntile_matches_single_task_ntile_on_range_path(spark, monkeypatch):
    """global_ntile must reproduce ANSI NTILE bucket sizes/assignment
    exactly while planning the DISTRIBUTED rank (no unpartitioned
    WindowExec). The size gate is forced shut so the range-partitioned
    path — the one that runs at real scale — is the path under test,
    including a row count that does not divide the tile count."""
    import wiki_mysql_spark.operators.ids as ids_mod
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from wiki_mysql_spark.operators.ids import global_ntile

    monkeypatch.setattr(ids_mod, "_SMALL_SORT_BYTES", 0)  # force range path
    n, k = 10_007, 7  # 10007 = 7*1429 + 4 -> first 4 tiles get 1430 rows
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % 1_000_003).alias("key"),
        F.col("id").alias("rowid"),
    ).repartition(8)
    out = global_ntile(df, ["key", "rowid"], k, tile_col="t")
    expected = df.select(
        "key", "rowid",
        F.ntile(k).over(Window.orderBy("key", "rowid")).cast("long").alias("t"),
    )
    got = {(r["key"], r["rowid"]): r["t"] for r in out.collect()}
    want = {(r["key"], r["rowid"]): r["t"] for r in expected.collect()}
    assert got == want
    # and the distributed spelling must not contain an unpartitioned window
    from tests.test_plans import _walk_physical

    plan = out._jdf.queryExecution().executedPlan()
    for node in _walk_physical(plan):
        cls = node.getClass().getSimpleName()
        if cls.startswith("Window"):
            assert not node.partitionSpec().isEmpty(), cls


def test_global_ntile_fewer_rows_than_tiles(spark):
    from wiki_mysql_spark.operators.ids import global_ntile

    df = spark.createDataFrame([(3,), (1,), (2,)], ["v"])
    out = {r["v"]: r["t"] for r in global_ntile(df, ["v"], 10, tile_col="t").collect()}
    assert out == {1: 1, 2: 2, 3: 3}


def test_wiki_pipeline_fuzz_vs_reference_semantics(spark, tmp_path):
    """End-to-end differential fuzz of the WHOLE pipeline: 5 seeded random
    mini-dumps (markup-bearing article bodies from the cleaning-fuzz
    generator, redirect chains/cycles/self-loops/danglers, non-ns0 pages)
    through read_wiki_dump + build_wiki_tables, compared against an
    in-test reference that implements the dbfy semantics directly
    (clean via the transcribed gensim filter; resolve redirects to chain
    end; cycles and danglers drop; redirects share the target's body
    row). Generalizes the fixed 8-page E2E fixture to the surrounding
    input space."""
    import random
    from xml.sax.saxutils import escape

    from tests.gensim_reference import wiki_body_filter
    from tests.test_gensim_parity import (
        _fuzz_doc as make_fuzz_doc,
        _is_template_residual as is_template_residual,
    )

    rng = random.Random(0xE7E)
    for trial in range(5):
        n_articles = rng.randint(4, 10)
        titles = [f"Art {trial}-{i}" for i in range(n_articles)]
        pages = []  # (aid, title, ns, text)
        aid = 1
        for t in titles:
            body = make_fuzz_doc(rng)
            while is_template_residual(body):  # exact-parity input space
                body = make_fuzz_doc(rng)
            pages.append((aid, t, 0, body))
            aid += 1
        # redirects: to an article, a chain, a 2-cycle, a self-loop, a dangler
        redirects = {
            f"R direct {trial}": titles[0],
            f"R chain {trial}": f"R direct {trial}",
            f"R cyc A {trial}": f"R cyc B {trial}",
            f"R cyc B {trial}": f"R cyc A {trial}",
            f"R self {trial}": f"R self {trial}",
            f"R dangle {trial}": "Missing page",
        }
        for i, t in enumerate(titles[1:], 1):
            if rng.random() < 0.4:
                redirects[f"R rand {trial}-{i}"] = rng.choice(titles)
        for rt, target in redirects.items():
            pages.append((aid, rt, 0, f"#REDIRECT [[{target}]]"))
            aid += 1
        pages.append((aid, f"Talk:skip {trial}", 4, "not ns 0"))

        xml = ["<mediawiki>"]
        for pa, pt, ns, txt in pages:
            xml.append(
                f"<page><title>{escape(pt)}</title><ns>{ns}</ns><id>{pa}</id>"
                f"<revision><text>{escape(txt)}</text></revision></page>"
            )
        xml.append("</mediawiki>")
        dump = tmp_path / f"fuzz{trial}.xml"
        dump.write_text("\n".join(xml), encoding="utf-8")

        arts, bodies = build_wiki_tables(read_wiki_dump(spark, str(dump)))
        got_articles = arts.collect()
        body_text = {r["id"]: r["body"] for r in bodies.collect()}
        got = {r["title"]: (r["aid"], body_text[r["body"]]) for r in got_articles}

        # in-test reference: dbfy.py semantics over the same pages
        want = {}
        cleaned = {}
        for pa, pt, ns, txt in pages:
            if ns != 0 or txt.startswith("#REDIRECT "):
                continue
            cleaned[pt] = wiki_body_filter(txt)
            want[pt] = (pa, cleaned[pt])
        for pa, pt, ns, txt in pages:
            if ns != 0 or not txt.startswith("#REDIRECT "):
                continue
            target = txt[len("#REDIRECT [["):-2]
            hops = 0
            while target in redirects and hops < 1000:
                target = redirects[target]
                hops += 1
            if hops >= 1000 or target not in cleaned:
                continue  # cycle or dangler: dropped
            want[pt] = (pa, cleaned[target])
        assert got == want, (
            f"trial {trial}: {set(got) ^ set(want)} differ; "
            f"first diff: " + next(
                (f"{k}: got {got.get(k)!r} want {want.get(k)!r}"
                 for k in set(got) | set(want) if got.get(k) != want.get(k)),
                "",
            )
        )


def test_etl_progress_reporting(spark, tmp_path):
    """P4 (reference tqdm bars, dbfy.py:158,191): progress=True narrates
    live task progress to the given sink while the ETL runs, prints a
    terminal 'done' line, and leaves no reporter thread behind. The
    reporter must not perturb results."""
    import io
    import threading
    import time

    from wiki_mysql_spark.plans.progress import job_progress
    from wiki_mysql_spark.plans.wiki_pipeline import run_wiki_etl

    dump = tmp_path / "mini.xml"
    pages = "".join(
        f"<page><title>P{i}</title><ns>0</ns><id>{i}</id>"
        f"<revision><text>body text {i}</text></revision></page>"
        for i in range(8)
    )
    dump.write_text(f"<mediawiki>{pages}</mediawiki>")

    counts = run_wiki_etl(
        spark, str(dump), str(tmp_path / "out"), progress=True
    )
    assert counts == {"articles": 8, "bodies": 8, "quarantine": 0}
    assert not [
        t for t in threading.enumerate() if t.name.startswith("progress-")
    ]

    # the reporter itself, against a slow enough action to be observed
    sink = io.StringIO()
    with job_progress(spark, "probe", interval_sec=0.1, out=sink):
        spark.range(0, 30_000_000, 1, 64).selectExpr(
            "sum(id * 3 % 7)"
        ).collect()
        time.sleep(0.3)
    lines = sink.getvalue().splitlines()
    assert lines and lines[-1].startswith("[probe] done in")
    task_lines = [l for l in lines if "tasks (" in l and "stage" in l]
    assert task_lines, lines  # at least one live stage report
