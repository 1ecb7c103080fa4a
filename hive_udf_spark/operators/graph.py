"""Relational graph analytics beyond connected components.

Connected components (the dedup clustering workhorse) lives in
operators/dedup.py; this module adds centrality. PageRank over the
near-dup pair graph is the canonical-document signal that upgrades
"keep the min id per cluster" (dedup_representatives) to "keep the most
central exemplar", and at web scale link-graph PageRank is a classic
corpus quality feature.

Design for engine-exact iteration (the BPE-trainer discipline applied
to linear algebra): ranks are integer MICRO-points and each step uses
only integer sums and ONE defined floor division —

    r_{k+1}(v) = (1e6 − 1000·damping_milli)
               + Σ_{u→v} (damping_milli · r_k(u)) div (1000 · deg(u))

so a fixed number of iterations reproduces bit-for-bit in any engine
with integer division (DuckDB ``//`` on non-negative operands). This is
the standard damped power iteration up to the per-edge floor (error
< 1 micro-point per edge per step) on the unnormalized "mass"
formulation (r_0 = 1e6 per node; total mass ≈ n·1e6, not 1).

Scale shape: each iteration is edges ⋈ ranks on the source key (a
fixed-width (node, rank) shuffle), one partial-aggregated in-mass sum
keyed by destination, one left join back to the node axis. Degrees are
computed once. Dangling mass (nodes with no out-edges) is DROPPED, not
redistributed — irrelevant for symmetrized similarity graphs (every
node has out-edges), documented for directed use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_fixed", "symmetrize_edges"]


def symmetrize_edges(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Undirected pair relation → directed edge relation (both
    directions), deduplicated — the adapter from any ``*_pairs``
    operator (near-dup, shared-signature, Hamming-blocked) to the graph
    ops."""
    a = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    b = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    return a.unionByName(b).distinct()


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping_milli: int = 850,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration integer PageRank: (node, rank_micro) after
    ``iters`` damped power steps (see module docstring for the exact
    recurrence and its engine-portability argument). Duplicate edges
    are collapsed; ranks are comparable within one run (unnormalized
    mass formulation).

    ``seeds`` (a one-column DataFrame of node ids) switches to
    PERSONALIZED PageRank: teleport mass lands only on seed nodes
    (base term and initial rank are seed-only), so ranks measure
    decayed reachability FROM the seeds — the transitive-expansion
    primitive: start from known-contaminated / known-high-quality
    docs and spread through the near-dup graph to score everything a
    few similarity hops away (direct-match decontamination catches
    hop 1; this scores the chain). Non-seed nodes unreachable from
    any seed score exactly 0; seeds absent from the edge relation
    (isolated docs) still appear, scoring their teleport base."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not 0 <= damping_milli <= 1000:
        raise ValueError("damping_milli must be in [0, 1000]")
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d")).distinct()
    # e feeds FOUR plan branches (both node projections, the degree
    # aggregate, the edge-weight join): materialize the deduplicated edge
    # list once instead of re-running the upstream + distinct per branch
    # (r15; at cluster scale use reliable checkpoint(), the repo-wide
    # materialize-once trade-off)
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("__s").alias("__n"))
        .unionByName(e.select(F.col("__d").alias("__n")))
        .distinct()
    )
    deg = e.groupBy("__s").agg(F.count(F.lit(1)).cast("long").alias("__deg"))
    ew = e.join(deg, "__s")
    # The rank recurrence references the edge and node relations once
    # PER ITERATION; left lazy, Spark re-executes the (possibly
    # expensive — a near-dup pair join) upstream plan `iters` times.
    # Materialize the loop invariants once: iteration cost becomes
    # |E| joins over a checkpointed fixed-width relation, the GraphX
    # discipline. (Measured: the simhash-graph bench entry dropped
    # ~5x after this.)
    ew = ew.localCheckpoint(eager=True)
    nodes = nodes.localCheckpoint(eager=True)
    base_val = F.lit(1_000_000 - 1000 * damping_milli).cast("long")
    if seeds is None:
        base = base_val
        r = nodes.select("__n", F.lit(1_000_000).cast("long").alias("__r"))
    else:
        seed_col = seeds.columns[0]
        sd = seeds.select(F.col(seed_col).alias("__n")).distinct().withColumn(
            "__is_seed", F.lit(1)
        )
        # seeds with no edges still carry teleport mass: extend the node
        # axis with isolated seeds so they appear in the output (scoring
        # their base each iteration) instead of silently vanishing
        nodes = nodes.unionByName(sd.select("__n")).distinct()
        nodes = nodes.join(sd, "__n", "left").select(
            "__n", F.coalesce("__is_seed", F.lit(0)).alias("__is_seed")
        )
        base = F.when(F.col("__is_seed") == 1, base_val).otherwise(F.lit(0).cast("long"))
        r = nodes.select(
            "__n",
            F.when(F.col("__is_seed") == 1, F.lit(1_000_000))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("__r"),
        )
    for i in range(iters):
        mass = (
            ew.join(r, ew["__s"] == r["__n"])
            .select(
                "__d",
                F.expr(f"({damping_milli} * __r) div (1000 * __deg)").alias("__m"),
            )
            .groupBy("__d")
            .agg(F.sum("__m").alias("__mass"))
        )
        r = nodes.join(mass, nodes["__n"] == mass["__d"], "left").select(
            "__n", (base + F.coalesce("__mass", F.lit(0))).cast("long").alias("__r")
        )
        # The loop invariants are checkpointed above, but r itself chains
        # two joins per iteration onto one lazy plan — at iters=30+ the
        # analyzer/codegen cost of the O(iters)-deep tree explodes before
        # any data moves. Truncate lineage every few iterations so `iters`
        # is a free parameter; r is a fixed-width (node, rank) relation,
        # so the checkpoint materializes |V| longs, never the join tree.
        if (i + 1) % 5 == 0 and i + 1 < iters:
            r = r.localCheckpoint(eager=True)
    return r.select(F.col("__n").alias("node"), F.col("__r").alias("rank_micro"))
