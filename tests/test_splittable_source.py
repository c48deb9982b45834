"""Splittable dump reader (text source + from_xml) vs the XML source.

The XML source reads one task per FILE (measured), so a single-file dump
serializes its parse; the splittable reader fans a single bz2 stream across
tasks and must produce the SAME rows. Corruption semantics are page-granular
here (the XML source's are file-granular, pinned in chaos_etl_script.py)."""

from __future__ import annotations

import bz2

import pytest

from wiki_mysql_spark.sources.wikixml import (
    project_corrupt,
    project_pages,
    read_wiki_dump_raw,
    read_wiki_dump_raw_splittable,
)

from test_wiki_pipeline import WIKI_XML


def _pages(df):
    return sorted(map(tuple, project_pages(df).collect()))


@pytest.mark.parametrize("compress", [False, True])
def test_splittable_matches_xml_source(spark, tmp_path, compress):
    if compress:
        path = tmp_path / "dump.xml.bz2"
        path.write_bytes(bz2.compress(WIKI_XML.encode()))
    else:
        path = tmp_path / "dump.xml"
        path.write_text(WIKI_XML)
    a = _pages(read_wiki_dump_raw(spark, str(path)))
    b = _pages(read_wiki_dump_raw_splittable(spark, str(path)))
    assert a == b
    assert len(a) == 7  # ns-10 page filtered, nothing else lost


def test_corruption_is_page_granular(spark, tmp_path):
    # struct_bad's <text> never closes; the XML source abandons the rest of
    # the file after it (chaos_etl_script.py pins that), the splittable
    # reader must lose ONLY the broken page — survivors after the break.
    def page(aid, title, text):
        return (
            f"<page><title>{title}</title><ns>0</ns><id>{aid}</id>"
            f"<revision><text>{text}</text></revision></page>"
        )

    struct_bad = (
        "<page><title>Nest</title><ns>0</ns><id>998</id>"
        "<revision><text>never closed</revision></page>"
    )
    doc = (
        "<mediawiki>"
        + page(1, "Before", "a")
        + struct_bad
        + page(2, "After", "b")
        + page(3, "Last", "c")
        + "</mediawiki>"
    )
    path = tmp_path / "dump.xml"
    path.write_text(doc)
    raw = read_wiki_dump_raw_splittable(spark, str(path))
    titles = sorted(r.title for r in project_pages(raw).collect())
    assert titles == ["After", "Before", "Last"]
    corrupt = project_corrupt(raw).collect()
    assert len(corrupt) == 1
    assert "Nest" in corrupt[0].corrupt_record


def test_framing_and_siteinfo(spark, tmp_path):
    doc = (
        '<mediawiki xmlns="http://example.invalid/" xml:lang="en">\n'
        "<siteinfo><sitename>T</sitename>\n<dbname>t</dbname></siteinfo>\n"
        "<page><title>Only</title><ns>0</ns><id>1</id>"
        "<revision><text>x</text></revision></page>\n"
        "</mediawiki>\n"
    )
    path = tmp_path / "dump.xml"
    path.write_text(doc)
    raw = read_wiki_dump_raw_splittable(spark, str(path))
    assert [r.title for r in project_pages(raw).collect()] == ["Only"]
    assert project_corrupt(raw).count() == 0

    empty = tmp_path / "empty.xml"
    empty.write_text("<mediawiki>\n</mediawiki>\n")
    raw = read_wiki_dump_raw_splittable(spark, str(empty))
    assert raw.count() == 0


def test_single_bz2_file_splits(spark, tmp_path):
    # the whole point: >1 input partition from ONE compressed file once the
    # file outgrows maxPartitionBytes (the XML source is pinned at 1/file)
    path = tmp_path / "big.xml.bz2"
    with bz2.open(path, "wt", encoding="utf-8") as f:
        f.write("<mediawiki>\n")
        for i in range(20_000):
            # content must not bz2-compress below the split size
            body = " ".join(
                format((i * 131 + j) * 2654435761 % 2**32, "x") for j in range(60)
            )
            f.write(
                f"<page><title>P {i}</title><ns>0</ns><id>{i + 1}</id>"
                f"<revision><text>{body}</text></revision></page>\n"
            )
        f.write("</mediawiki>\n")
    assert path.stat().st_size > 2_000_000
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    try:
        split_parts = read_wiki_dump_raw_splittable(
            spark, str(path)
        ).rdd.getNumPartitions()
        xml_parts = read_wiki_dump_raw(spark, str(path)).rdd.getNumPartitions()
        n = project_pages(read_wiki_dump_raw_splittable(spark, str(path))).count()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert xml_parts == 1
    assert split_parts > 1
    assert n == 20_000
