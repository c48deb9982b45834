"""Chaos harness for the wiki ETL's failure semantics, run in its OWN
SparkContext (``local[4,2]`` — 2 task attempts; the shared test session's
``local[*]`` has maxFailures=1 so an injected task failure would just kill
the job). Invoked by tests/test_chaos_etl.py as a subprocess; prints one
JSON result line on stdout.

Two faults, mirroring the reference's error tolerance
(``/root/reference/dbfy.py:142-143`` drop-on-error,
``/root/reference/database.py:42-57`` reconnect-retry):

1. a MALFORMED XML SHARD inside the dump directory — the job must survive
   and produce byte-identical articles/bodies to a clean run over the same
   good pages (PERMISSIVE parse -> null row -> ns filter drops it, the
   distributed analog of the reference's silent drop);
2. an injected MID-WRITE TASK FAILURE during the JDBC insert (a poison UDF
   raises on partition 0's first attempt AFTER several batch flushes) —
   the per-partition transaction must roll back and the task retry must
   leave the table exactly-once: clean-run row count, no duplicate ids.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def page(aid: int, title: str, text: str, ns: int = 0) -> str:
    return (
        f"<page><title>{title}</title><ns>{ns}</ns><id>{aid}</id>"
        f"<revision><text>{text}</text></revision></page>"
    )


def wrap(pages: str) -> str:
    return f"<mediawiki>{pages}</mediawiki>"


def main() -> None:
    tmp = sys.argv[1]
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4,2]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .appName("wiki-etl-chaos")
        .getOrCreate()
    )
    spark._jvm.java.lang.System.setProperty(
        "derby.stream.error.file", os.path.join(tmp, "derby.log")
    )
    result: dict = {}

    # ---- fixture dumps -----------------------------------------------------
    # Two malformed classes with DIFFERENT measured semantics:
    #  * field corruption (wrong types / missing fields) — well-formed XML,
    #    so only the bad page itself drops (PERMISSIVE null -> ns filter);
    #  * structural corruption (mismatched tags) — the tokenizer abandons
    #    the REST OF THAT FILE; the loss is file-granular but OBSERVABLE
    #    through the corrupt-record audit frame.
    good1 = "".join(
        page(i, f"Article {i}", f"body text {i} with [[Article {(i + 1) % 30}]]")
        for i in range(30)
    )
    good2 = "".join(
        page(100 + i, f"Extra {i}", f"#REDIRECT [[Article {i}]]" if i % 3 == 0
             else f"extra body {i}")
        for i in range(10)
    )
    good3 = "".join(page(200 + i, f"Doomed {i}", f"doomed {i}") for i in range(5))
    field_bad = (
        "<page><title>Bad types</title><ns>zero</ns><id>NaN</id>"
        "<revision><text>x</text></revision></page>"
        "<page><revision><text>no title, no ns, no id</text></revision></page>"
    )
    struct_bad = (
        "<page><title>Nest</title><ns>0</ns><id>998</id>"
        "<revision><text>text tag never closed</revision></page>"
    )
    clean_dir = os.path.join(tmp, "clean_dump")
    chaos_dir = os.path.join(tmp, "chaos_dump")
    os.makedirs(clean_dir)
    os.makedirs(chaos_dir)
    with open(os.path.join(clean_dir, "part1.xml"), "w") as f:
        f.write(wrap(good1))
    with open(os.path.join(clean_dir, "part2.xml"), "w") as f:
        f.write(wrap(good2))
    with open(os.path.join(chaos_dir, "part1.xml"), "w") as f:
        f.write(wrap(good1))
    with open(os.path.join(chaos_dir, "part2.xml"), "w") as f:
        f.write(wrap(field_bad + good2 + field_bad))
    with open(os.path.join(chaos_dir, "part3.xml"), "w") as f:
        f.write(wrap(struct_bad + good3))

    from wiki_mysql_spark.plans.wiki_pipeline import build_wiki_tables
    from wiki_mysql_spark.sources.wikixml import (
        read_wiki_dump,
        read_wiki_dump_corrupt,
    )

    def run(dump_dir: str):
        arts, bodies = build_wiki_tables(read_wiki_dump(spark, dump_dir))
        a = sorted(map(tuple, arts.collect()))
        b = sorted(map(tuple, bodies.collect()))
        return a, b

    a_clean, b_clean = run(clean_dir)
    a_chaos, b_chaos = run(chaos_dir)
    result["xml_articles_match"] = a_clean == a_chaos
    result["xml_bodies_match"] = b_clean == b_chaos
    result["n_articles"] = len(a_clean)
    result["n_bodies"] = len(b_clean)
    # the structurally-corrupt shard must be OBSERVABLE, not silent
    result["n_corrupt_records"] = read_wiki_dump_corrupt(spark, chaos_dir).count()
    result["clean_corrupt_records"] = read_wiki_dump_corrupt(
        spark, clean_dir
    ).count()

    # ---- mid-write JDBC failure + retry ------------------------------------
    from wiki_mysql_spark.sinks import write_jdbc

    marker_dir = os.path.join(tmp, "attempts")
    os.makedirs(marker_dir)

    @F.udf("long")
    def poison(aid):
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid, att = tc.partitionId(), tc.attemptNumber()
        with open(os.path.join(marker_dir, f"{pid}_{att}"), "a"):
            pass
        if pid == 0 and att == 0 and aid is not None and aid % 7 == 6:
            # the poison row sits past the first batch flushes (batchsize=5
            # below), so rows HAVE hit the connection when this fires — the
            # rollback is what keeps the retry exactly-once
            raise RuntimeError("injected mid-write failure")
        return aid

    arts, _ = build_wiki_tables(read_wiki_dump(spark, clean_dir))
    df = arts.repartition(4).withColumn("aid", poison("aid"))
    derby_url = f"jdbc:derby:{tmp}/db;create=true"
    write_jdbc(
        df, derby_url, "articles_chaos",
        driver="org.apache.derby.jdbc.EmbeddedDriver", batchsize=5,
    )
    back = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "articles_chaos")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .load()
    )
    back = back.toDF(*[c.lower() for c in back.columns])
    n = back.count()
    n_ids = back.select("id").distinct().count()
    attempts = sorted(os.listdir(marker_dir))
    result["jdbc_rows"] = n
    result["jdbc_distinct_ids"] = n_ids
    result["jdbc_expected"] = len(a_clean)
    result["retry_happened"] = "0_1" in attempts  # partition 0, attempt 1
    result["first_attempt_ran"] = "0_0" in attempts
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
