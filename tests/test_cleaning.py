"""Golden-output tests for the cleaning chain (SURVEY.md §5.2).

Cases cover: templates (incl. nested), pipe/plain/file/category links,
<ref>/tags/comments, HTML entities, unicode white/blacklist (whitelist
applied BEFORE blacklist, filters.py:34,46), and whitespace collapse keeping
the FIRST char of each run (filters.py:63).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wiki_mysql_spark.functions.cleaning import (
    clean_wiki_body,
    collapse_whitespace,
    decode_html_entities_udf,
    extract_redirect_target,
)

CASES = [
    ("plain", "Hello world.", "Hello world."),
    ("template", "Before {{Infobox|a=1}} after.", "Before after."),
    ("template_nested", "X {{outer {{inner}} rest}} Y", "X Y"),
    ("pipe_link", "See [[Target|the target]] now.", "See the target now."),
    ("plain_link", "See [[Target]] now.", "See Target now."),
    ("file_link", "A [[File:pic.jpg|thumb|caption]] B", "A B"),
    ("category_link", "Text [[Category:Things]] end", "Text end"),
    ("ref_tag", "Fact<ref name=x>citation</ref> stands.", "Fact stands."),
    ("html_tag", "A <b>bold</b> claim.", "A bold claim."),
    ("comment", "Visible <!-- hidden --> text.", "Visible text."),
    ("external_link", "Site [http://example.com the site] here.", "Site the site here."),
    ("external_bare", "Site [http://example.com] here.", "Site here."),
    ("entity_amp", "Fish &amp; chips &lt;3", "Fish & chips <3"),
    ("ws_collapse_first", "a\n   b\t\t c", "a\nb\tc"),
    ("ws_space_run", "a    b", "a b"),
]


@pytest.mark.parametrize("case_id,raw,expected", CASES, ids=[c[0] for c in CASES])
def test_clean_golden(spark, case_id, raw, expected):
    df = spark.createDataFrame([(raw,)], ["text"])
    out = df.select(clean_wiki_body(F.col("text")).alias("cleaned")).first()["cleaned"]
    assert out == expected


def test_unicode_whitelist_then_blacklist(spark):
    # whitelist keeps basic latin + hangul syllables; blacklist then removes
    # digits — order matters and matches filters.py append order (34 then 46)
    df = spark.createDataFrame([("abc123한글禁",)], ["text"])
    out = df.select(
        clean_wiki_body(
            F.col("text"),
            valid_unicodes=((0x20, 0x7E), (0xAC00, 0xD7AF)),
            invalid_unicodes=((0x30, 0x39),),
        ).alias("cleaned")
    ).first()["cleaned"]
    assert out == "abc한글"


def test_collapse_keeps_first_char(spark):
    df = spark.createDataFrame([("x\n  \t y",)], ["t"])
    assert df.select(collapse_whitespace(F.col("t")).alias("o")).first()["o"] == "x\ny"


def test_entity_udf_full_parity(spark):
    df = spark.createDataFrame(
        [("&amp;", "&"), ("&#65;", "A"), ("&#x42;", "B"), ("&eacute;", "é")],
        ["raw", "want"],
    )
    got = df.select(decode_html_entities_udf()(F.col("raw")).alias("o"), "want").collect()
    for row in got:
        assert row["o"] == row["want"]


@pytest.mark.parametrize(
    "body,target",
    [
        ("#REDIRECT [[Other Page]]", "Other Page"),
        ("#REDIRECT [[A|b]] trailing", "A|b"),
        ("no redirect here", None),
        ("text #REDIRECT [[X]]", None),  # .match is anchored (dbfy.py:129)
        ("#redirect [[x]]", None),  # case-sensitive, like the reference
        ("#REDIRECT [[]]", None),  # empty target never resolves anyway
    ],
)
def test_redirect_extract(spark, body, target):
    df = spark.createDataFrame([(body,)], ["text"])
    got = df.select(extract_redirect_target(F.col("text")).alias("t")).first()["t"]
    assert got == target
