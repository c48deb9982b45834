"""Transitive redirect resolution to a fixpoint (SURVEY.md A3).

The reference resolves each redirect by per-title recursion over three
driver-resident dicts (``/root/reference/dbfy.py:108-121,155-176``) — O(chain
length) hops per title, all titles in driver RAM, cycles caught by
``RecursionError`` and dropped, dangling targets silently dropped.

Here the redirect graph is a DataFrame of edges and resolution is **pointer
doubling**: each round substitutes every title's current target with that
target's own target, squaring the distance covered. A chain of depth d
resolves in ceil(log2(d)) self-joins instead of d — at 100 TB that is ~10
shuffles for even pathological chains instead of thousands. Cycles never
reach a terminal node, so after the iteration bound any title whose final
target is still a redirect source is dropped — byte-identical semantics to
the reference's RecursionError/dangling drops.

``localCheckpoint`` truncates lineage each round; without it the plan tree
doubles per iteration and Catalyst analysis itself becomes the bottleneck.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    redirects: DataFrame,
    targets: DataFrame,
    *,
    max_depth: int = 1024,
    eager_checkpoint: bool = True,
) -> DataFrame:
    """Resolve redirect chains transitively.

    Args:
        redirects: edges ``(title, target)`` — one row per redirect page.
            Extra columns (e.g. ``aid``) are carried through untouched.
        targets: resolvable endpoints ``(title, body_id)`` — the loaded
            articles (the reference's ``ttl2bid``, ``dbfy.py:183-186``).
        max_depth: chains longer than this are dropped (the reference's
            implicit bound is Python's recursion limit, ~1000).

    Returns:
        ``redirects``'s carried columns + ``body_id`` for every redirect
        whose chain ends in a loaded article. Cycle members and dangling
        chains produce no row (``dbfy.py:118-121,161-166``).
    """
    edges = redirects.select(
        F.col("title").alias("src"), F.col("target").alias("dst")
    )

    # mapping: src -> current known endpoint after 2^i hops
    mapping = edges
    rounds = max(1, math.ceil(math.log2(max_depth)))
    for _ in range(rounds):
        hop = mapping.select(
            F.col("src").alias("h_src"), F.col("dst").alias("h_dst")
        )
        stepped = (
            mapping.join(hop, mapping.dst == hop.h_src, "left")
            .select("src", F.coalesce("h_dst", "dst").alias("dst"))
        )
        if eager_checkpoint:
            stepped = stepped.localCheckpoint(eager=True)
        # Converged when no dst is itself still a redirect source. Cheap
        # aggregate on the checkpointed frame; cycles keep this non-zero
        # until the round bound, which is the documented drop semantics.
        mapping = stepped
        still_chained = (
            mapping.join(hop.select(F.col("h_src").alias("open_src")).distinct(),
                         mapping.dst == F.col("open_src"), "left_semi")
            .limit(1)
            .count()
        )
        if still_chained == 0:
            break

    resolved = mapping.join(
        targets.select(F.col("title").alias("t_title"), "body_id"),
        mapping.dst == F.col("t_title"),
        "inner",  # inner join drops dangling + cycle remnants
    ).select(F.col("src"), "body_id")

    return redirects.join(
        resolved, redirects.title == resolved.src, "inner"
    ).drop("src")
