"""Wiki-pipeline operators as oracle-checked queries.

The fixture tables carry no wikitext, so these queries run the REAL pipeline
operators (functions/cleaning.py, operators/redirects.py, operators/ids.py,
plans/wiki_pipeline.py) over a small inline page fixture — the DuckDB oracle
gets the same rows via VALUES, the same regex chain via
``cleaning_chain_duckdb_sql`` (generated from the SAME pass list the Spark
chain executes), and a recursive CTE as the independent fixpoint oracle.
``documents`` rows are unioned in where volume matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wiki_mysql_spark.functions.cleaning import (
    REDIRECT_PATTERN,
    clean_wiki_body,
    cleaning_chain_duckdb_sql,
    extract_redirect_target,
)
from wiki_mysql_spark.operators.ids import dense_ids
from wiki_mysql_spark.operators.redirects import resolve_redirects
from wiki_mysql_spark.plans.wiki_pipeline import build_wiki_tables
from wiki_mysql_spark.queries.registry import query
from wiki_mysql_spark.sources.tables import load_table, spread_small_scan

# (aid, title, ns, text) — covers markup variants, a redirect, a 2-hop chain,
# a 2-cycle, a dangling redirect, and a non-ns-0 page (dropped).
PAGES_FIXTURE: list[tuple[int, str, int, str]] = [
    (1, "Alpha", 0, "Alpha body with a [[Beta|link]] and {{tmpl}} markup plus &amp; entity."),
    (2, "Beta", 0, "Beta <b>bold</b> body <!-- note --> with [http://x.com a site]."),
    (3, "Alpha redirect", 0, "#REDIRECT [[Alpha]]"),
    (4, "Chain start", 0, "#REDIRECT [[Alpha redirect]]"),
    (5, "Cycle one", 0, "#REDIRECT [[Cycle two]]"),
    (6, "Cycle two", 0, "#REDIRECT [[Cycle one]]"),
    (7, "Dangler", 0, "#REDIRECT [[Nowhere]]"),
    (8, "Gamma", 0, "Gamma has {{a {{b}} c}} nested templates and [[File:x.png|thumb]] a file."),
    (9, "Template:Skip", 10, "not in namespace zero"),
]


def _sql_str(s: str) -> str:
    return "e'" + s.replace("\\", "\\\\").replace("'", "''").replace("\n", "\\n") + "'"


def _pages_values() -> str:
    rows = ", ".join(
        f"({aid}::BIGINT, {_sql_str(title)}, {ns}, {_sql_str(text)})"
        for aid, title, ns, text in PAGES_FIXTURE
    )
    return f"(VALUES {rows}) AS pages_fixture(aid, title, ns, raw)"


def _pages_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(PAGES_FIXTURE, ["aid", "title", "ns", "text"])


@query(
    "wiki_clean_markup",
    f"""
    WITH inputs AS (
        SELECT aid AS id, raw FROM {_pages_values()} WHERE ns = 0
        UNION ALL
        SELECT doc_id + 1000 AS id, text AS raw FROM documents
    )
    SELECT id, {cleaning_chain_duckdb_sql('raw')} AS cleaned
    FROM inputs
    """,
)
def wiki_clean_markup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F6 cleaning chain (``/root/reference/filters.py:52-64``) as native
    regexp columns, over the markup fixture + the documents corpus."""
    fixture = (
        _pages_df(spark)
        .where(F.col("ns") == 0)
        .select(F.col("aid").alias("id"), F.col("text").alias("raw"))
    )
    docs = spread_small_scan(load_table(spark, sf_dir, "documents")).select(
        (F.col("doc_id") + 1000).alias("id"), F.col("text").alias("raw")
    )
    return fixture.unionByName(docs).select(
        "id", clean_wiki_body(F.col("raw")).alias("cleaned")
    )


_UNI_VALID = ((0x20, 0x7E),)  # printable ASCII
_UNI_INVALID = ((0x30, 0x39),)  # then strip digits


@query(
    "wiki_unicode_filter",
    f"""
    SELECT aid AS id,
           {cleaning_chain_duckdb_sql('raw', remove_html=False,
                                      valid_unicodes=_UNI_VALID,
                                      invalid_unicodes=_UNI_INVALID)} AS cleaned
    FROM {_pages_values()}
    """,
)
def wiki_unicode_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode whitelist-then-blacklist deletion (F4/F5; order per
    ``filters.py:34,46``) with the ranges compiled into char-class regexes
    at plan time (``/root/reference/dbfy.py:20-31,56-64``)."""
    return _pages_df(spark).select(
        F.col("aid").alias("id"),
        clean_wiki_body(
            F.col("text"),
            remove_html=False,
            valid_unicodes=_UNI_VALID,
            invalid_unicodes=_UNI_INVALID,
        ).alias("cleaned"),
    )


_REDIR_SQL_PAT = REDIRECT_PATTERN.replace("\\", "\\\\")


@query(
    "wiki_redirect_split",
    f"""
    SELECT aid, title,
           CASE WHEN regexp_matches(raw, e'{_REDIR_SQL_PAT}')
                 AND regexp_extract(raw, e'{_REDIR_SQL_PAT}', 1) <> ''
                THEN regexp_extract(raw, e'{_REDIR_SQL_PAT}', 1) END AS target,
           (regexp_matches(raw, e'{_REDIR_SQL_PAT}')
            AND regexp_extract(raw, e'{_REDIR_SQL_PAT}', 1) <> '') AS is_redirect
    FROM {_pages_values()} WHERE ns = 0
    """,
)
def wiki_redirect_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect detection F7 (anchored ``#REDIRECT [[...]]`` — the reference
    uses ``REDIRECT_PAT.match``, ``dbfy.py:105,129``) splitting one scan into
    redirect/article branches with no per-row Python."""
    target = extract_redirect_target(F.col("text"))
    return (
        _pages_df(spark)
        .where(F.col("ns") == 0)
        .select(
            "aid",
            "title",
            target.alias("target"),
            target.isNotNull().alias("is_redirect"),
        )
    )


def _edges_values() -> str:
    rows = []
    for aid, title, ns, text in PAGES_FIXTURE:
        if ns == 0 and text.startswith("#REDIRECT [["):
            tgt = text[len("#REDIRECT [[") : -2]
            rows.append(f"({_sql_str(title)}, {_sql_str(tgt)}, {aid})")
    return f"(VALUES {', '.join(rows)}) AS redirect_edges(title, target, aid)"


def _targets_values() -> str:
    rows = [
        f"({_sql_str(title)}, {aid})"
        for aid, title, ns, text in PAGES_FIXTURE
        if ns == 0 and not text.startswith("#REDIRECT [[")
    ]
    return f"(VALUES {', '.join(rows)}) AS article_targets(title, body_id)"


@query(
    "wiki_redirect_resolve",
    f"""
    WITH RECURSIVE walk(title, cur, depth) AS (
        SELECT title, target, 1 FROM {_edges_values()}
        UNION ALL
        SELECT w.title, r.target, w.depth + 1
        FROM walk w JOIN {_edges_values().replace('redirect_edges', 'r')}
             ON w.cur = r.title
        WHERE w.depth < 32
    )
    SELECT w.title, CAST(article_targets.body_id AS BIGINT) AS body_id
    FROM walk w JOIN {_targets_values()} ON w.cur = article_targets.title
    """,
)
def wiki_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive redirect fixpoint (A3, ``dbfy.py:108-121,155-176``) via
    pointer doubling — O(log depth) self-joins; cycles/dangling drop out.
    Oracle: an independent recursive-CTE walk in DuckDB."""
    edges, targets = [], []
    for aid, title, ns, text in PAGES_FIXTURE:
        if ns != 0:
            continue
        if text.startswith("#REDIRECT [["):
            edges.append((title, text[len("#REDIRECT [[") : -2], aid))
        else:
            targets.append((title, aid))
    redirects = spark.createDataFrame(edges, ["title", "target", "aid"])
    target_df = spark.createDataFrame(targets, ["title", "body_id"])
    return resolve_redirects(redirects, target_df).select("title", "body_id")


@query(
    "wiki_articles_bodies",
    f"""
    WITH RECURSIVE pages AS (SELECT * FROM {_pages_values()} WHERE ns = 0),
    split AS (
        SELECT aid, title, raw,
               CASE WHEN regexp_matches(raw, e'{_REDIR_SQL_PAT}')
                     AND regexp_extract(raw, e'{_REDIR_SQL_PAT}', 1) <> ''
                    THEN regexp_extract(raw, e'{_REDIR_SQL_PAT}', 1) END AS target
        FROM pages
    ),
    bodies AS (
        SELECT row_number() OVER (ORDER BY title) AS body_id, aid, title,
               {cleaning_chain_duckdb_sql('raw')} AS body
        FROM split WHERE target IS NULL
    ),
    edges AS (SELECT title, target FROM split WHERE target IS NOT NULL),
    walk(title, cur, depth) AS (
        SELECT title, target, 1 FROM edges
        UNION ALL
        SELECT w.title, e.target, w.depth + 1
        FROM walk w JOIN edges e ON w.cur = e.title WHERE w.depth < 32
    ),
    resolved AS (
        SELECT s.aid, s.title, b.body_id
        FROM walk w
        JOIN bodies b ON w.cur = b.title
        JOIN split s ON s.title = w.title
    ),
    all_articles AS (
        SELECT aid, title, body_id FROM bodies
        UNION ALL
        SELECT aid, title, body_id FROM resolved
    )
    SELECT row_number() OVER (ORDER BY title, aid) AS id,
           CAST(aid AS BIGINT) AS aid, title, CAST(body_id AS BIGINT) AS body
    FROM all_articles
    """,
)
def wiki_articles_bodies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole reference workload end-to-end (``dbfy.py:254-313`` ->
    ``sql/init.sql:5-19``): split, clean, assign dense ids, resolve redirect
    chains, emit the articles table (redirects share their target's body row,
    ``README.md:49-54``)."""
    articles, _bodies = build_wiki_tables(_pages_df(spark))
    return articles


@query(
    "wiki_surrogate_ids",
    """
    SELECT row_number() OVER (ORDER BY doc_id) AS id, doc_id, source
    FROM documents
    """,
)
def wiki_surrogate_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense id assignment A1 (AUTO_INCREMENT analog, ``sql/init.sql:6,12``)
    on a real table: range-partitioned sort + per-partition offsets — no
    single-task global window, no Python round-trip."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return dense_ids(docs, ["doc_id"], id_col="id")


@query(
    "wiki_redirect_resolve_rcte",
    f"""
    WITH RECURSIVE walk(title, cur, depth) AS (
        SELECT title, target, 1 FROM {_edges_values()}
        UNION ALL
        SELECT w.title, r.target, w.depth + 1
        FROM walk w JOIN {_edges_values().replace('redirect_edges', 'r')}
             ON w.cur = r.title
        WHERE w.depth < 32
    )
    SELECT w.title, CAST(article_targets.body_id AS BIGINT) AS body_id
    FROM walk w JOIN {_targets_values()} ON w.cur = article_targets.title
    """,
)
def wiki_redirect_resolve_rcte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative variant of the redirect fixpoint (A3): Spark's native
    WITH RECURSIVE (4.x) runs the same walk the DuckDB oracle does — both
    engines execute the identical SQL semantics, cycles/danglers drop out
    by never joining a target. The pointer-doubling operator
    (`operators/redirects.py`, `wiki_redirect_resolve`) remains the scale
    path: O(log depth) self-joins vs the CTE's O(depth) iterations; this
    entry documents that the engine also accepts the declarative spelling."""
    edges, targets = [], []
    for aid, title, ns, text in PAGES_FIXTURE:
        if ns != 0:
            continue
        if text.startswith("#REDIRECT [["):
            edges.append((title, text[len("#REDIRECT [[") : -2], aid))
        else:
            targets.append((title, aid))
    spark.createDataFrame(edges, ["title", "target", "aid"]).createOrReplaceTempView(
        "redirect_edges_v"
    )
    spark.createDataFrame(targets, ["title", "body_id"]).createOrReplaceTempView(
        "article_targets_v"
    )
    return spark.sql(
        """
        WITH RECURSIVE walk(title, cur, depth) AS (
            SELECT title, target, 1 FROM redirect_edges_v
            UNION ALL
            SELECT w.title, r.target, w.depth + 1
            FROM walk w JOIN redirect_edges_v r ON w.cur = r.title
            WHERE w.depth < 32
        )
        SELECT w.title, CAST(t.body_id AS BIGINT) AS body_id
        FROM walk w JOIN article_targets_v t ON w.cur = t.title
        """
    )
