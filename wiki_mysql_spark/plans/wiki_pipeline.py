"""The wiki ETL end-to-end (SURVEY.md §3.1 — the reference's actual workload).

Reference lifecycle (``/root/reference/dbfy.py:254-313``): stream pages ->
per-page ``_process`` (redirect branch / clean+insert branch, ``dbfy.py:
123-153``) -> driver-resident redirect maps -> single-threaded redirect pass
(``dbfy.py:155-176``). Two tables out: ``bodies(id, body)`` and
``articles(id, aid, title, body->bodies.id)`` (``sql/init.sql:5-19``).

Spark plan — one scan, two branches, no per-row control flow:

    pages ──ns filter──┬─ redirects (title, target, aid)        [F7 split]
                       └─ articles  ──clean F1-F6──┬─ bodies    [dense ids]
                                                   └─ articles rows
    redirects ──pointer-doubling fixpoint──> extra articles rows [A3]

Differences from the reference, by design:
  * ids are deterministic (ordered by title) instead of insertion-ordered —
    dump order is not reproducible under parallel scan anyway.
  * failed rows would be quarantined, not silently dropped (the reference
    drops on any insert error, ``dbfy.py:142-143``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wiki_mysql_spark.functions.cleaning import (
    clean_wiki_body,
    extract_redirect_target,
    is_redirect_body,
)
from wiki_mysql_spark.operators.ids import dense_ids
from wiki_mysql_spark.operators.redirects import resolve_redirects


def _build_wiki_frames(
    pages: DataFrame,
    *,
    remove_html: bool = True,
    valid_unicodes: tuple[tuple[int, int], ...] = (),
    invalid_unicodes: tuple[tuple[int, int], ...] = (),
    max_redirect_depth: int = 1024,
    exact_templates: bool = False,
    materializer=None,
) -> dict[str, DataFrame | None]:
    """The wiki build with its internal frames exposed: returns
    ``{"articles", "bodies_full" (id, body, body_octets), "corrupt"}``.

    Scratch-IO design (the r8 rework — r7's 24M-page throughput dip was
    scratch-IO amplification): the ONLY full-text materialization is the
    ``staged`` frame — parse + redirect split + cleaning fused into one
    pass, holding CLEANED text once (raw text never lands on scratch; the
    pre-r8 shape wrote raw parse AND the cleaned+numbered frame, plus a
    full-text layout checkpoint inside dense_ids). Everything downstream
    of ``staged`` is narrow except exactly one join that re-attaches the
    text to its body id:

      * ids: dense_ids over the (aid, title) projection — a columnar read
        that never touches the text column, a narrow range exchange, a
        narrow layout checkpoint;
      * bodies: staged ⋈ ids on aid — the single full-text shuffle (at
        cluster scale, bucket both sides by aid to make it co-located);
        its output feeds the bodies sink directly, so the text is read
        from staged exactly once;
      * body_octets is computed AT STAGING so the quarantine split and
        the orphan checks are narrow column reads — pre-r8 they re-read
        the full text column once per consumer (3-4 extra text scans).

    ``materializer``: optional ``(df, name) -> df`` that pins the staged
    frame somewhere durable (run_wiki_etl passes its byte-gated
    memory-or-parquet strategy); defaults to a block-manager
    localCheckpoint. If ``pages`` carries a ``corrupt_record`` column
    (project_pages_with_corrupt), corrupt captures ride through the same
    single materialization and come back as the ``corrupt`` frame."""
    # A dump that arrives as a single split (one modest .bz2 file — Spark's
    # XML source reads a compressed file whole) would serialize every
    # downstream stage; spread it across the cluster once up front. Bytes-
    # gated (plan statistics, no job) so tiny fixtures skip the exchange;
    # no-op when the source is already parallel (many part files at scale).
    from wiki_mysql_spark.sources.tables import spread_small_scan

    pages = spread_small_scan(pages)

    has_attr = "redirect_title" in pages.columns
    has_corrupt = "corrupt_record" in pages.columns
    attr = F.col("redirect_title") if has_attr else F.lit(None).cast("string")
    text = F.coalesce(F.col("text"), F.lit(""))  # null revision text -> ""
    # eqNullSafe: corrupt rows carry null ns and must not look like pages
    is_page = F.col("ns").eqNullSafe(0)
    # Redirect iff the dump attribute says so OR the body matches the
    # anchored pattern — including an empty [[]] target, which stays a
    # redirect (and then never resolves), matching dbfy.py:129-134.
    is_red = attr.isNotNull() | is_redirect_body(text)
    keep = is_page
    if has_corrupt:
        keep = keep | F.col("corrupt_record").isNotNull()
    cols = [
        F.col("aid"),
        F.col("title"),
        (is_page & is_red).alias("is_redirect"),
        F.when(
            is_page & is_red, F.coalesce(attr, extract_redirect_target(text))
        ).alias("redirect_target"),
        # cleaning runs HERE, fused into the staging pass — the staged
        # write is the parse's single consumer, and the cleaned body (the
        # only full-text column kept) is what materializes
        F.when(
            is_page & ~is_red,
            clean_wiki_body(
                text,
                remove_html=remove_html,
                valid_unicodes=valid_unicodes,
                invalid_unicodes=invalid_unicodes,
                exact_templates=exact_templates,
            ),
        ).alias("body_text"),
    ]
    if has_corrupt:
        cols.append(F.col("corrupt_record"))
    staged = (
        pages.where(keep)
        .select(*cols)
        .withColumn("body_octets", F.octet_length("body_text"))
    )
    staged = (
        materializer(staged, "staged")
        if materializer is not None
        else staged.localCheckpoint(eager=False)
    )

    # Size the SHARED staged frame once and hand the verdict to every
    # downstream strategy gate: dense_ids (x2) and resolve_redirects would
    # otherwise each localCheckpoint + byte-probe their own derived input —
    # four bounded jobs whose answer is implied by this one, since every
    # gated frame is a projection/filter/union of staged's rows (bytes and
    # rows both <= staged's). One bounded probe job on the checkpointed
    # staged (or a free stats read when a materializer made it a scan)
    # replaces them. 8 MB = the tightest downstream gate
    # (redirects._SMALL_EDGES_BYTES; dense_ids' bound is 64 MB), row cap =
    # is_small_input's. Strategy only: a big corpus gets hint None and the
    # gates behave exactly as before.
    from wiki_mysql_spark.sources.tables import _row_bytes_estimate, leaf_bytes

    _STAGED_SMALL_BYTES = 8 << 20
    # The known-stats branch sees COMPRESSED on-disk leaf bytes while the
    # downstream gates bound estimated IN-MEMORY octet lengths; parquet+zstd
    # wiki text expands ~3-5x on decode, so the hint only fires when the
    # compressed leaves are under bound/4 — a staged frame in the ambiguous
    # band (bound/4 .. bound) falls through to hint None and the gates'
    # own in-memory probes decide (the r13 advice item: a <8MB-compressed
    # frame must not smuggle a >8MB edge set into a driver collect).
    _COMPRESSION_EXPANSION = 4
    known, unknown = leaf_bytes(staged)
    if not unknown and known is not None:
        small_hint = (
            True
            if known * _COMPRESSION_EXPANSION < _STAGED_SMALL_BYTES
            else None
        )
    else:
        _probe = staged.limit(100_001).select(
            F.count(F.lit(1)).alias("_n"),
            F.coalesce(F.sum(_row_bytes_estimate(staged)), F.lit(0)).alias("_b"),
        ).collect()[0]
        small_hint = (
            True
            if int(_probe["_n"]) <= 100_000
            and int(_probe["_b"]) < _STAGED_SMALL_BYTES
            else None
        )

    redirect_pages = staged.where(F.col("is_redirect")).select(
        "title", F.col("redirect_target").alias("target"), "aid"
    )
    # non-redirect ns-0 pages are exactly the rows with a cleaned body
    articles_staged = staged.where(F.col("body_text").isNotNull())
    # bodies: one row per non-redirect page (the reference does NOT content-
    # dedup bodies — two identical texts get two rows, README.md:49-54).
    # Ids are assigned over the NARROW (aid, title) projection — the text
    # column never enters the range exchange or the layout checkpoint —
    # then joined back by aid (unique per page), the one full-text shuffle.
    ids = dense_ids(
        articles_staged.select("aid", "title"),
        ["title"],
        id_col="body_id",
        small_hint=small_hint,
    )
    bodies_full = (
        articles_staged.select("aid", "body_text", "body_octets")
        .join(ids.select("aid", "body_id"), "aid")
        .select(
            F.col("body_id").alias("id"),
            F.col("body_text").alias("body"),
            "body_octets",
        )
    )
    article_rows = ids.select("title", "body_id")
    direct_articles = ids.select("aid", "title", "body_id")

    resolved_redirects = resolve_redirects(
        redirect_pages,
        article_rows,
        max_depth=max_redirect_depth,
        small_hint=small_hint,
    ).select("aid", "title", "body_id")

    all_articles = direct_articles.unionByName(resolved_redirects)
    articles = dense_ids(
        all_articles, ["title", "aid"], id_col="id", small_hint=small_hint
    ).select("id", "aid", "title", F.col("body_id").alias("body"))
    corrupt = (
        staged.where(F.col("corrupt_record").isNotNull()).select(
            "corrupt_record"
        )
        if has_corrupt
        else None
    )
    return {"articles": articles, "bodies_full": bodies_full, "corrupt": corrupt}


def build_wiki_tables(
    pages: DataFrame,
    *,
    remove_html: bool = True,
    valid_unicodes: tuple[tuple[int, int], ...] = (),
    invalid_unicodes: tuple[tuple[int, int], ...] = (),
    max_redirect_depth: int = 1024,
    exact_templates: bool = False,
    materializer=None,
) -> tuple[DataFrame, DataFrame]:
    """pages ``(aid, title, ns, text[, redirect_title])`` ->
    ``(articles, bodies)`` exactly shaped like ``sql/init.sql:5-19``.
    Thin wrapper over :func:`_build_wiki_frames` (which run_wiki_etl uses
    directly for the precomputed-octets quarantine split and the fused
    corrupt audit)."""
    frames = _build_wiki_frames(
        pages,
        remove_html=remove_html,
        valid_unicodes=valid_unicodes,
        invalid_unicodes=invalid_unicodes,
        max_redirect_depth=max_redirect_depth,
        exact_templates=exact_templates,
        materializer=materializer,
    )
    return frames["articles"], frames["bodies_full"].select("id", "body")


def parse_unichr_range(txt: str) -> tuple[int, int]:
    """The reference's CLI range format (``/root/reference/dbfy.py:19-30``):
    two comma-delimited ints, hex (``0x2466``) or decimal, inclusive."""
    lo, hi = txt.split(",")
    as_int = lambda s: int(s, 16) if "x" in s else int(s)  # noqa: E731
    return as_int(lo), as_int(hi)


def _heap_bytes(spark) -> int:
    """The driver JVM's max heap (local mode: the only JVM)."""
    try:
        return int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())
    except Exception:
        return 8 << 30


def _dump_bytes(dump_path: str) -> int:
    if os.path.isdir(dump_path):
        return sum(
            os.path.getsize(os.path.join(dump_path, f))
            for f in os.listdir(dump_path)
        )
    try:
        return os.path.getsize(dump_path)
    except OSError:
        return 0


# bz2-compressed wiki text expands ~6-8x; the pipeline holds ONE full-text
# materialization (the staged parse+clean frame — r8: raw text no longer
# lands on scratch, so the old x2 two-frame factor is gone). Past this
# fraction of the heap, block-manager caching stops being a cache and
# becomes the allocation pattern that OOMs the executors (measured: 24M
# pages / 1.3 GB bz2 on an 8 GB heap died in the sink stage; 10M / 543 MB
# survived but with the heap pinned at its ceiling — the r6 5M->10M p/s
# dip).
_MAT_EXPANSION = 8
_MAT_HEAP_FRACTION = 0.35


def run_wiki_etl(
    spark,
    dump_path: str,
    out_dir: str,
    *,
    jdbc_url: str | None = None,
    jdbc_user: str = "root",
    jdbc_password: str = "",
    limit: int | None = None,
    splittable: bool = True,
    progress: bool = False,
    materialize: str = "auto",
    **build_kwargs,
) -> dict[str, int]:
    """The full CLI workload (``/root/reference/dbfy.py:254-313`` analog):
    dump -> articles/bodies -> quarantine split -> parquet (always) ->
    MySQL via JDBC (when a URL is given). Returns row counts.

    ``limit`` caps the number of pages processed — exact-n ``df.limit``
    semantics (the reference's ``--limit`` was off-by-chunk between its
    1-proc and MP paths; SURVEY documents choosing exact-n).

    ``splittable=True`` (default) parses via the text-source/``from_xml``
    reader, which splits WITHIN bz2 files (the XML source reads one task
    per file — a single-file dump would serialize the whole parse onto one
    core no matter the cluster size) and bounds structural-corruption loss
    to the broken page instead of the rest of its file.

    ``progress=True`` reports live task progress to stderr while the ETL
    runs — the reference's tqdm bars (``dbfy.py:158,191,231``), Spark-native
    (`plans/progress.py:job_progress` over StatusTracker telemetry).

    ``materialize`` picks where the compute-once STAGED frame (the fused
    parse+clean+split pass — the pipeline's only full-text
    materialization since r8) lives: ``"memory"`` = block-manager
    localCheckpoint (fastest while the frame fits), ``"disk"`` = zstd
    temp parquet under ``out_dir`` (bounded memory: writes stream,
    re-reads are scan-speed columnar with COLUMN PRUNING — every
    downstream consumer except the bodies join reads only narrow
    columns; the stage boundary a real 100 TB pipeline puts on durable
    storage), ``"auto"`` (default) = byte-gated on estimated expanded
    size vs the JVM heap. Measured necessity: 24M pages (1.3 GB bz2) on
    an 8 GB heap OOMs in the sink stage under "memory"; 10M survives
    with the heap pinned at its ceiling — the r6 5M→10M p/s dip."""
    from contextlib import nullcontext

    from wiki_mysql_spark.plans.progress import job_progress
    from wiki_mysql_spark.sinks import (
        ARTICLES_DDL,
        BODIES_DDL,
        split_quarantine,
        write_jdbc,
        write_parquet,
    )
    from wiki_mysql_spark.sources.wikixml import (
        project_corrupt,
        project_pages,
        project_pages_with_corrupt,
        read_wiki_dump_raw,
        read_wiki_dump_raw_splittable,
    )

    mode = materialize
    if mode == "auto":
        est = _dump_bytes(dump_path) * _MAT_EXPANSION
        mode = (
            "disk"
            if est > _MAT_HEAP_FRACTION * _heap_bytes(spark)
            else "memory"
        )
    if mode not in ("memory", "disk"):
        raise ValueError(
            f"materialize must be auto|memory|disk, got {materialize!r}"
        )
    if materialize == "auto":
        import sys

        print(f"# wiki-etl materialize: {mode} (auto)", file=sys.stderr)
    mat_paths: list[str] = []
    # big-dump runs bound the PER-TASK parquet writer buffer (see
    # sinks.write_parquet): 32 concurrent text writers at the 128 MB
    # default row group OOMed the 8 GB local[32] heap at 24M pages
    rg_bytes = (32 << 20) if mode == "disk" else None
    # ...and the READER buffer symmetrically: the vectorized reader sizes
    # its column vectors as batch-rows x value width, so the default 4096
    # rows over the staged frame's text column is a ~10-25 MB humongous
    # allocation PER TASK PER COLUMN — 32 concurrent read tasks OOMed the
    # 8 GB heap at 24M pages (G1 GCLocker retry stacks in the parquet
    # reader) even with the single-materialization layout. 512 rows keeps
    # each text batch ~1-3 MB; narrow columns lose nothing measurable at
    # these widths (the batch is still thousands of values).
    reader_batch_conf = "spark.sql.parquet.columnarReaderBatchSize"
    saved_batch = spark.conf.get(reader_batch_conf, None) if mode == "disk" else None
    if mode == "disk":
        spark.conf.set(reader_batch_conf, "512")

    def mat(df: DataFrame, name: str) -> DataFrame:
        if mode == "memory":
            return df.localCheckpoint(eager=False)
        path = f"{out_dir}/_mat_{name}"
        # zstd on the scratch parquet (parquet's default is snappy): the
        # staged frame is pure text, where zstd's ratio advantage directly
        # shrinks the round-trip IO that drove the r7 24M-page p/s dip
        w = df.write.mode("overwrite").option("compression", "zstd")
        if rg_bytes:
            w = w.option("parquet.block.size", str(rg_bytes))
        w.parquet(path)
        mat_paths.append(path)
        return spark.read.parquet(path)

    reader = read_wiki_dump_raw_splittable if splittable else read_wiki_dump_raw
    raw = reader(spark, dump_path)
    if limit is not None:
        # exact-n limit must count ns-0 PAGES only, which needs the page
        # and corrupt branches separated before staging — so a sampling
        # run materializes the raw parse first (the pre-r8 shape: one
        # tokenize shared by both branches). Production runs (no limit)
        # take the fused single-write path below.
        raw = mat(raw, "raw")
        src = project_pages(raw).limit(limit)
        corrupt_src = project_corrupt(raw)
    else:
        # production path: ONE conditional projection carries ns-0 pages
        # AND corrupt captures into the staged materialization inside
        # _build_wiki_frames — the parse has a single consumer and RAW
        # text never hits scratch (only the cleaned body materializes;
        # the pre-r8 raw+numbered double write was the measured IO
        # amplification behind the 24M-page throughput dip)
        src = project_pages_with_corrupt(raw)
        corrupt_src = None
    frames = _build_wiki_frames(src, materializer=mat, **build_kwargs)
    articles, bodies, quarantine = split_quarantine(
        frames["articles"], frames["bodies_full"]
    )
    # structurally-corrupt page records join the quarantine audit (the
    # reference silently drops erroring pages, dbfy.py:142-143); folded
    # into the quarantine WRITE's lineage, so no extra job materializes
    if corrupt_src is None:
        corrupt_src = frames["corrupt"]
    corrupt = corrupt_src.select(
        F.lit("pages").alias("table_name"),
        F.lit(None).cast("long").alias("id"),
        F.concat(
            F.lit("corrupt xml record: "),
            F.substring("corrupt_record", 1, 200),
        ).alias("reject_reason"),
    )
    quarantine = quarantine.unionByName(corrupt)

    reporter = (
        job_progress(spark, "wiki-etl") if progress else nullcontext()
    )
    try:
        with reporter:
            write_parquet(articles, f"{out_dir}/articles", row_group_bytes=rg_bytes)
            write_parquet(bodies, f"{out_dir}/bodies", row_group_bytes=rg_bytes)
            write_parquet(quarantine, f"{out_dir}/quarantine", row_group_bytes=rg_bytes)

            if jdbc_url:
                write_jdbc(
                    spark.read.parquet(f"{out_dir}/articles"), jdbc_url, "articles",
                    user=jdbc_user, password=jdbc_password,
                    create_table_ddl=ARTICLES_DDL,
                )
                write_jdbc(
                    spark.read.parquet(f"{out_dir}/bodies"), jdbc_url, "bodies",
                    user=jdbc_user, password=jdbc_password,
                    create_table_ddl=BODIES_DDL,
                )
    finally:
        # the temp stage-boundary parquet is scratch, not output: drop it
        # even when a sink write raises (a failed run must not leak
        # several-times-the-dump of full-text temp parquet under out_dir)
        import shutil

        for p in mat_paths:
            shutil.rmtree(p, ignore_errors=True)
        if mode == "disk":
            if saved_batch is None:
                spark.conf.unset(reader_batch_conf)
            else:
                spark.conf.set(reader_batch_conf, saved_batch)

    return {
        "articles": spark.read.parquet(f"{out_dir}/articles").count(),
        "bodies": spark.read.parquet(f"{out_dir}/bodies").count(),
        "quarantine": spark.read.parquet(f"{out_dir}/quarantine").count(),
    }


if __name__ == "__main__":  # pragma: no cover — thin CLI (dbfy.py analog)
    import argparse

    from wiki_mysql_spark.session import get_session

    p = argparse.ArgumentParser(description="wiki dump -> articles/bodies ETL")
    p.add_argument("dump", help="mediawiki XML dump path (.xml or .xml.bz2)")
    p.add_argument("out", help="output directory for parquet tables")
    p.add_argument("--jdbc-url", default=None, help="optional MySQL JDBC URL")
    p.add_argument("--jdbc-user", default="root")
    p.add_argument("--jdbc-password", default="")
    # reference-parity filtering flags (dbfy.py:52-66)
    p.add_argument("--limit", type=int, default=None,
                   help="process at most N pages (exact-n)")
    p.add_argument("--remove-html", type=int, default=1,
                   help="decode HTML entities (reference --remove_html)")
    p.add_argument("--valid-unichrs", type=parse_unichr_range, action="append",
                   default=None, metavar="LO,HI",
                   help="whitelist unicode range, hex or decimal, inclusive; "
                        "repeatable (reference --valid_unichrs)")
    p.add_argument("--invalid-unichrs", type=parse_unichr_range, action="append",
                   default=None, metavar="LO,HI",
                   help="blacklist unicode range; repeatable")
    p.add_argument("--exact-templates", action="store_true",
                   help="use the nesting-exact template scan (reference "
                        "parity for templates containing stray single "
                        "braces) instead of the regex fixpoint")
    p.add_argument("--remove-multiple-whitespaces", action="store_true",
                   help="accepted for drop-in compatibility; the collapse is "
                        "always applied, matching the reference's ACTUAL "
                        "behavior (its flag was parsed but never wired)")
    p.add_argument("--progress", action="store_true",
                   help="print live task progress to stderr (the "
                        "reference's tqdm bars, Spark-native)")
    p.add_argument("--materialize", choices=("auto", "memory", "disk"),
                   default="auto",
                   help="where the compute-once full-text frames live: "
                        "block manager (memory), temp parquet (disk), or "
                        "byte-gated on dump size vs heap (auto, default)")
    args = p.parse_args()
    counts = run_wiki_etl(
        get_session("wiki-etl"),
        args.dump,
        args.out,
        jdbc_url=args.jdbc_url,
        jdbc_user=args.jdbc_user,
        jdbc_password=args.jdbc_password,
        limit=args.limit,
        progress=args.progress,
        materialize=args.materialize,
        remove_html=bool(args.remove_html),
        valid_unicodes=tuple(args.valid_unichrs or ()),
        invalid_unicodes=tuple(args.invalid_unichrs or ()),
        exact_templates=args.exact_templates,
    )
    print(counts)
