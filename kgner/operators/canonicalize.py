"""Distributed connected components for alias/redirect canonicalization.

The reference resolves one redirect hop (db.resolve_redirect,
/root/reference/kb/parse_text.py:59-63); real web KBs have chains and cycles,
so we canonicalize via connected components: iterative min-label propagation
expressed as DataFrame self-joins (no GraphFrames dependency).

Scale notes:
- each iteration is one shuffle on `node` (groupBy min) + one join;
  iterations = O(graph diameter); redirect graphs have tiny diameter (<10).
- `max_iters` caps pathological chains; `localCheckpoint()` every iteration
  cuts the lineage so the plan doesn't grow exponentially (classic iterative-
  DataFrame pitfall).
- convergence check is a cheap aggregate (sum of label changes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    max_iters: int = 20,
    local_threshold: int = 2_000_000,
    local_threshold_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """edges(src, dst) undirected -> (node, component) with component = the
    lexicographically smallest node in the component (matches the oracle
    kgner.linkops.connected_components).

    Hybrid strategy: alias/redirect graphs are DIMENSION-sized (~10^7-10^8
    edges for all of Wikipedia — far below corpus scale), so when the edge
    list fits the driver we run union-find in one pass instead of paying
    O(diameter) Spark jobs of pure scheduling latency. Above the threshold,
    distributed min-label propagation (below) takes over unchanged. Both
    produce identical (node, component) output.

    The local bound is BYTE-aware, not just row-count: a tiny probe ESTIMATES
    average edge width, and the row cap shrinks so the bounded collect stays
    under `local_threshold_bytes` — 2M edges of wide node strings would
    otherwise land several hundred MB on the driver. The probe is an
    unordered limit(), which typically reads one partition; if edge widths
    are skewed across partitions the estimate can undercount, so the
    per-edge estimate is padded by a 1.25x safety factor (and the collect
    stays hard-bounded by the `local_threshold` row cap regardless). With
    the defaults the byte cap starts undercutting the 2M row cap at ~5 chars
    of node text per edge (256 MB / (1.25 x (98 B overhead + chars)));
    dedup_keep_min's 20-char encoded ids cap at ~1.8M edges — the caps are
    deliberately the same order so neither silently dominates.
    """
    PROBE = 1024
    probe = [
        (r[0], r[1]) for r in edges.select("src", "dst").limit(PROBE).collect()
    ]
    if len(probe) < PROBE:
        rows = probe  # the probe WAS the whole graph
    else:
        # ~98 bytes of PyObject/tuple overhead per edge beyond the characters;
        # 1.25x pads the single-partition probe against cross-partition skew
        avg_bytes = 1.25 * (
            sum(len(s or "") + len(d or "") for s, d in probe) / len(probe) + 98
        )
        row_cap = min(local_threshold, int(local_threshold_bytes / avg_bytes))
        rows = [
            (r[0], r[1])
            for r in edges.select("src", "dst").limit(row_cap + 1).collect()
        ]
        if len(rows) > row_cap:
            return _cc_distributed(edges, max_iters)
    from kgner.linkops import connected_components as uf

    comp = uf(rows)
    spark = edges.sparkSession
    return spark.createDataFrame(
        sorted(comp.items()), "node string, component string"
    )


def _cc_distributed(edges: DataFrame, max_iters: int = 20) -> DataFrame:
    """Distributed min-label propagation (used above local_threshold)."""
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .union(edges.select(F.col("src").alias("src"), F.col("src").alias("dst")))
        .union(edges.select(F.col("dst").alias("src"), F.col("dst").alias("dst")))
        .distinct()
    )
    # label[node] = min neighbor (incl. self) to start
    labels = sym.groupBy(F.col("src").alias("node")).agg(
        F.min("dst").alias("component")
    )
    labels = labels.localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iters):
        # propagate: candidate label via neighbors' labels
        neigh = (
            sym.join(labels, sym.dst == labels.node, "inner")
            .select(sym.src.alias("node"), F.col("component"))
        )
        new_labels = (
            neigh.union(labels.select("node", "component"))
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # returning partial labels would silently split entities across
        # components — fail loudly; callers raise max_iters for deep chains
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} iterations"
            " — graph diameter exceeds max_iters; raise max_iters"
        )
    return labels


def canonical_map(
    edges: DataFrame, titles: DataFrame, max_iters: int = 20
) -> DataFrame:
    """-> (alias_norm, canonical_id): every node of the alias graph mapped to
    its component's canonical representative.

    Representative = the KB title in the component when one exists (smallest
    title if several), else the smallest node — same rule as the oracle.
    `titles` must have a `title` column. Output alias_norm is lowercased.
    """
    comp = connected_components(edges, max_iters=max_iters)
    t = titles.select(F.col("title")).distinct()
    rep = (
        comp.join(t, comp.node == t.title, "left")
        .groupBy("component")
        .agg(
            F.min("title").alias("title_rep"),
            F.min("node").alias("node_rep"),
        )
        .select(
            "component",
            F.coalesce("title_rep", "node_rep").alias("canonical_id"),
        )
    )
    # case-variant nodes in different components can collide after lower();
    # min(canonical_id) makes the winner deterministic (oracle matches)
    out = (
        comp.join(rep, "component")
        .select(F.lower(F.col("node")).alias("alias_norm"), "canonical_id")
        .groupBy("alias_norm")
        .agg(F.min("canonical_id").alias("canonical_id"))
    )
    # The map is dimension-sized and typically consumed twice per pipeline
    # (broadcast-index build AND the triple join) — checkpoint so the edge
    # build + CC + representative joins run once per job instead of once
    # per consumer (~40% of the bench KG pipeline before this).
    return out.localCheckpoint(eager=False)
