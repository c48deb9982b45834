"""Golden parity test: the engine's native cleaning chain vs a transcription
of gensim's own filter (tests/gensim_reference.py) — the INDEPENDENT oracle
the shared-pass-list DuckDB comparison cannot provide. The reference pipeline
literally calls gensim (``/root/reference/filters.py:55-58``), so matching
the transcribed gensim functions is matching the reference.

Known, documented divergence (asserted, so any drift is caught):

* numeric character entities (``&#65;`` / ``&#x42;``): the native fast path
  decodes only the common NAMED entities JVM-side; full numeric decoding is
  the Arrow-iterator UDF's job (``decode_html_entities_udf``), verified here
  to restore exact parity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.gensim_reference import remove_markup, wiki_body_filter
from wiki_mysql_spark.functions.cleaning import (
    clean_wiki_body,
    collapse_whitespace,
    decode_html_entities_udf,
    strip_wiki_markup,
)

FIXTURES = [
    "plain text no markup at all",
    "entity &amp; decode &lt;tag&gt; &quot;q&quot; &nbsp;end",
    "a [[simple link]] here",
    "a [[target|description]] piped link",
    "[http://example.com external desc] and [https://x.org] bare",
    "<!-- comment --> visible",
    "multi\n<!-- line\ncomment -->\ntext",
    "<ref name=x>footnote</ref>after",
    "<ref name=x/>selfclosed",
    "<math>x^2</math> formula",
    "<nowiki>[[not a link]]</nowiki> after",
    "<b>bold</b> and <div class=x>div</div>",
    "{{template}} simple",
    "{{outer {{inner}} nested}} deep",
    "{{a{{b{{c}}d}}e}} triple",
    "[[Category:Some category]]tail",
    "[[File:pic.jpg|thumb|caption here]] after",
    "[[Image:img.png|left|100px|the caption]] x",
    "head\n{| class=wikitable\n|-\n| cell1 || cell2\n|}\ntail",
    "a || b table cells",
    "line\n! header1 !! header2\nrest",
    "|- row start",
    "{{cite|a=[[link|d]]}} template with link",
    "[[link with {{tmpl}} inside]]",
    "nested [[a|[[b|c]]]] links",
    "english text\n[[fr:Article français]]\n[[de:Deutsch]]",
    "end langs\n[[fr:Français]]",
    "empty [[]] link",
    "empty braces {} and {{}} here",
    "unclosed {{template runs to end",
    "unclosed [[link runs",
    "brackets [stray] and ]backwards[",
    "&amp;amp; double encoded",
    "&notarealentity; stays",
    "mixed &lt;ref&gt;entity ref&lt;/ref&gt; decoded-then-stripped",
    "white   space\t\tcollapse\n\n\nruns",
    "tab\tfirst \t keeps tab",
    'attr <span style="a=b">spanned</span> done',
    "pipe in [[a|b|c]] link",
    "#REDIRECT [[Target page]]",
    "{| nested {| table |} inner |} outer\nx",
    "a [[File:x.png|cap [[inner|d]] more]] b",
    "<ref>one</ref><ref>two</ref> double",
    "<maths>not math tag</maths>",
    "{{t1}}{{t2}} adjacent",
    "[[a]][[b]] adjacent links",
    "http://bare.url stays",
    "[ftp://site.com desc here] ftp",
    "a<br/>b<br />c",
    "rowspan formatting line\nkeep me",
    "x\n ! indented header\ny",
]

# fixtures whose expected native output differs from gensim, with the reason
NUMERIC_ENTITY_FIXTURES = [
    "entity &#65; upper &#x42; hex &#97; lower",
]


@pytest.fixture(scope="module")
def cleaned(spark):
    rows = [(i, t) for i, t in enumerate(FIXTURES)]
    df = spark.createDataFrame(rows, ["i", "t"])
    return {
        r["i"]: r["c"]
        for r in df.select("i", clean_wiki_body(F.col("t")).alias("c")).collect()
    }


def test_native_chain_matches_gensim(cleaned):
    diverged = []
    for i, t in enumerate(FIXTURES):
        want = wiki_body_filter(t)
        if cleaned[i] != want:
            diverged.append((t, cleaned[i], want))
    assert not diverged, "\n".join(
        f"{t!r}\n  native: {g!r}\n  gensim: {w!r}" for t, g, w in diverged
    )


def test_numeric_entities_documented_divergence(spark):
    """Native fast path leaves numeric entities; the UDF decode restores
    exact gensim parity for them."""
    rows = [(i, t) for i, t in enumerate(NUMERIC_ENTITY_FIXTURES)]
    df = spark.createDataFrame(rows, ["i", "t"])
    native = {
        r["i"]: r["c"]
        for r in df.select("i", clean_wiki_body(F.col("t")).alias("c")).collect()
    }
    decode = decode_html_entities_udf()
    full = {
        r["i"]: r["c"]
        for r in df.select(
            "i",
            collapse_whitespace(strip_wiki_markup(decode(F.col("t")))).alias("c"),
        ).collect()
    }
    for i, t in enumerate(NUMERIC_ENTITY_FIXTURES):
        want = wiki_body_filter(t)
        assert native[i] != want, "divergence healed — remove it from the pinned list"
        assert full[i] == want, f"UDF path broke parity: {full[i]!r} vs {want!r}"


def test_transcription_self_check():
    """Spot-check the transcribed gensim behaves like the published original
    on canonical examples from gensim's own docstrings/tests."""
    assert remove_markup("'''Anarchism''' is a [[political philosophy]]") \
        == "'''Anarchism''' is a political philosophy"
    assert remove_markup("{{unreferenced|date=2010}}text") == "text"
    # promote_remaining: plain [[link]] survives as its text
    assert remove_markup("[[a]] and [[b|c]]") == "a and c"


# ---------------------------------------------------------------------------
# Seeded-random fuzz: generated nested markup (templates in tables in links,
# entity soup, non-BMP text, unclosed constructs) through BOTH engines.
# The 51 fixtures above are points; this is the surrounding space.
# ---------------------------------------------------------------------------

_FUZZ_WORDS = (
    "data wiki page spark query alpha beta gamma nested text word "
    "title link row cell värld 世界 データ こんにちは Ωmega ñandú"
).split()
_FUZZ_EMOJI = ["🌍", "🚀", "𝄞", "🎉"]  # non-BMP (supplementary plane)
_FUZZ_ENTITIES = ["&amp;", "&lt;", "&gt;", "&quot;", "&nbsp;", "&notreal;"]


def _fuzz_span(rng, depth: int) -> str:
    def words() -> str:
        ws = [rng.choice(_FUZZ_WORDS) for _ in range(rng.randint(1, 4))]
        if rng.random() < 0.08:
            ws.append(rng.choice(_FUZZ_EMOJI))
        return " ".join(ws)

    if depth >= 3:
        return words()
    r = rng.random()
    inner = lambda: _fuzz_span(rng, depth + 1)  # noqa: E731
    if r < 0.30:
        return words()
    if r < 0.38:
        return rng.choice(_FUZZ_ENTITIES)
    if r < 0.48:
        return (
            f"[[{words()}|{inner()}]]" if rng.random() < 0.5 else f"[[{words()}]]"
        )
    if r < 0.58:
        return f"{{{{{words()}|{inner()}}}}}" if rng.random() < 0.5 \
            else f"{{{{{words()}}}}}"
    if r < 0.64:
        return f"{{| class=x\n|-\n| {inner()} || {inner()}\n|}}"
    if r < 0.70:
        return f"<ref name=a>{inner()}</ref>" if rng.random() < 0.7 \
            else "<ref name=b/>"
    if r < 0.76:
        tag = rng.choice(["b", "i", "div", "span"])
        return f"<{tag}>{inner()}</{tag}>"
    if r < 0.80:
        return f"<!-- {words()} -->"
    if r < 0.85:
        return f"[http://example.com/{rng.randint(0, 99)} {words()}]"
    if r < 0.89:
        return rng.choice(["\n\n", " \t ", "\n \n", "   "])
    if r < 0.93:
        return rng.choice(["{{", "}}", "[[", "]]", "[", "]", "|", "||"])
    if r < 0.97:
        return rng.choice([f"<math>{words()}</math>", f"<nowiki>{words()}</nowiki>"])
    return f"[[File:x{rng.randint(0, 9)}.png|thumb|{inner()}]]"


def _fuzz_doc(rng) -> str:
    return " ".join(_fuzz_span(rng, 0) for _ in range(rng.randint(1, 10)))


def _is_template_residual(doc: str) -> bool:
    """True when the native regex template stage (innermost x3 + tail) and
    the nesting-exact scan disagree on the DECODED text — the documented
    residual class (stray single braces inside templates, e.g. a table in
    a template, or nesting beyond the iteration budget)."""
    import re as _re

    from tests.gensim_reference import decode_htmlentities
    from wiki_mysql_spark.functions.cleaning import remove_templates_scan

    s = decode_htmlentities(doc)
    t = s
    for _ in range(3):
        t = _re.sub(r"\{\{[^{}]*\}\}", "", t)
    t = _re.sub(r"\{\{.*", "", t, flags=_re.DOTALL)
    return t != remove_templates_scan(s)


def test_fuzz_native_chain_matches_gensim(spark):
    """1,000 seeded-random nested-markup docs through both engines.

    Contract (mirroring the numeric-entity precedent): the native chain
    must match the transcribed gensim filter EXACTLY on every doc outside
    the documented template-residual class (stray single braces inside
    templates — non-regular brace balance no regex can express); for
    residual docs, the gated ``remove_templates_exact_udf`` path must
    restore exact parity. Both partitions must be non-trivially populated
    so both paths are genuinely exercised."""
    import random

    from wiki_mysql_spark.functions.cleaning import (
        decode_html_entities,
        remove_templates_exact_udf,
    )

    rng = random.Random(0xC1EA)
    docs = [(i, _fuzz_doc(rng)) for i in range(1000)]
    df = spark.createDataFrame(docs, ["i", "t"])
    tpl_exact = remove_templates_exact_udf()
    rows = df.select(
        "i",
        clean_wiki_body(F.col("t")).alias("native"),
        collapse_whitespace(
            strip_wiki_markup(tpl_exact(decode_html_entities(F.col("t"))))
        ).alias("exact"),
    ).collect()
    native = {r["i"]: r["native"] for r in rows}
    exact = {r["i"]: r["exact"] for r in rows}

    n_residual = 0
    diverged, diverged_exact = [], []
    for i, t in docs:
        want = wiki_body_filter(t)
        if _is_template_residual(t):
            n_residual += 1
            if exact[i] != want:
                diverged_exact.append((t, exact[i], want))
        elif native[i] != want:
            diverged.append((t, native[i], want))
    assert n_residual > 0, "generator no longer exercises the residual class"
    assert n_residual < 300, "residual class should be the minority"
    assert not diverged, (
        f"{len(diverged)} NON-residual divergence(s); first three:\n"
        + "\n".join(
            f"doc: {t!r}\n  native: {g!r}\n  gensim: {w!r}"
            for t, g, w in diverged[:3]
        )
    )
    assert not diverged_exact, (
        f"{len(diverged_exact)} divergence(s) on the EXACT path; first three:\n"
        + "\n".join(
            f"doc: {t!r}\n  exact: {g!r}\n  gensim: {w!r}"
            for t, g, w in diverged_exact[:3]
        )
    )


# fixtures in the template-residual class: templates containing stray single
# braces (a {| table |} inside an infobox — common in real dumps), which the
# regex fixpoint+tail over-drops to end-of-text but the nesting-exact scan
# handles (non-regular brace balance). Documented divergence of the DEFAULT
# path; the exact_templates=True config flag restores reference parity.
TEMPLATE_RESIDUAL_FIXTURES = [
    "{{a {| b |} c}} tail",
    "{{infobox | data = {| class=x\n| cell\n|} }} body text survives",
]


def test_template_residual_documented_divergence(spark):
    """Default regex path diverges on stray-single-brace templates (pinned —
    if it heals, move the fixture to FIXTURES); the exact_templates=True
    chain restores exact gensim parity."""
    rows = [(i, t) for i, t in enumerate(TEMPLATE_RESIDUAL_FIXTURES)]
    df = spark.createDataFrame(rows, ["i", "t"])
    out = {
        r["i"]: (r["dflt"], r["exact"])
        for r in df.select(
            "i",
            clean_wiki_body(F.col("t")).alias("dflt"),
            clean_wiki_body(F.col("t"), exact_templates=True).alias("exact"),
        ).collect()
    }
    for i, t in enumerate(TEMPLATE_RESIDUAL_FIXTURES):
        want = wiki_body_filter(t)
        dflt, exact = out[i]
        assert dflt != want, (
            f"default-path divergence healed on {t!r} — move it to FIXTURES"
        )
        assert exact == want, (
            f"exact_templates path broke parity on {t!r}: {exact!r} vs {want!r}"
        )


def test_exact_templates_matches_default_on_regular_fixtures(spark):
    """On the 51 regular fixtures (no stray-brace templates) the two chains
    must agree — the flag changes only the residual class."""
    rows = [(i, t) for i, t in enumerate(FIXTURES)]
    df = spark.createDataFrame(rows, ["i", "t"])
    bad = (
        df.select(
            "t",
            clean_wiki_body(F.col("t")).alias("dflt"),
            clean_wiki_body(F.col("t"), exact_templates=True).alias("exact"),
        )
        .where(F.col("dflt") != F.col("exact"))
        .collect()
    )
    assert not bad, "\n".join(
        f"{r['t']!r}\n  default: {r['dflt']!r}\n  exact: {r['exact']!r}"
        for r in bad
    )


def test_table_markup_parity_including_text_start(spark):
    """Regression for two review-caught gensim divergences: (1) the
    consuming RE_P12 spelling swallowed the newline gensim's (?=\\n)
    lookahead preserves, stranding '| ' cell markers when a body BEGINS
    with a table; (2) the reduced nested-iteration pass list missed table
    markers whose required newline is created by a later literal pass of
    the same iteration. Hand shapes plus an adversarial table-token fuzz
    (the original fuzz only generated well-formed mid-string spans)."""
    import random

    cases = [
        "{| class=wikitable\n| cell1 || cell2\n|}\nbody text",
        "|-\n| a || b\n|}\nrest",
        "lead\n{| x\n| c1\n|}\n",
        "{| t\n|}",
        "{| t\n|} tail",
    ]
    rng = random.Random(3)
    toks = ["{|", "|}", "|-", "|| c", "| x", "word", "\n", "!!", "a |", " "]
    for _ in range(300):
        cases.append("".join(rng.choice(toks) for _ in range(rng.randint(2, 14))))
    df = spark.createDataFrame(list(enumerate(cases)), ["i", "t"])
    got = {
        r["i"]: r["c"]
        for r in df.select("i", clean_wiki_body(F.col("t")).alias("c")).collect()
    }
    diverged = [
        (t, got[i], wiki_body_filter(t))
        for i, t in enumerate(cases)
        if got[i] != wiki_body_filter(t)
    ]
    assert not diverged, "\n".join(
        f"{t!r}\n  native: {g!r}\n  gensim: {w!r}" for t, g, w in diverged[:5]
    )
