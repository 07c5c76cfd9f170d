"""Connected components over duplicate-candidate edges — cluster-level
near-dup deduplication for a training corpus.

Pair generators (``dedup.ngram_jaccard_pairs``, ``simhash_candidates``,
``similarity.embedding_near_dups``) emit *edges*; dropping one side of
each pair under-deletes (A~B, B~C keeps A and C even though the cluster
is {A,B,C}). The standard fix is to take connected components of the
near-dup graph and keep ONE canonical document per component — what
every large-scale dedup pipeline (e.g. the CCNet / RefinedWeb family)
does after LSH.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), expressed as
DataFrame ops. Each round is two groupBy-min shuffles over the current
edge set; the edge set converges to stars (v -> component-min) in
O(log n) rounds even on pathological path graphs — unlike plain label
propagation, whose round count is the graph diameter. Dup clusters are
usually near-cliques (1-2 rounds), but a 100-TB crawl's mirror chains
are exactly where the O(log n) bound earns its keep.

The driver loop only compares two scalar aggregates per round
(edge count + order-invariant xxhash64 checksum) — no collect of edges,
so the iteration state lives entirely in executors.

No reference equivalent (TinyETL has no graph/dedup surface); this is
part of the training-data operator set (SURVEY.md §2.2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _drop_checkpoint(df: DataFrame) -> None:
    """Drop a localCheckpoint'd frame's persisted blocks NOW.
    ``Dataset.unpersist`` is a documented no-op for checkpointed frames;
    the blocks belong to the LogicalRDD's underlying RDD."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass  # non-classic backend / plan drift: the context cleaner gets it


def _canon(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected canonical form: (u < v), self-loops dropped, distinct."""
    return (edges.select(F.least(F.col(src), F.col(dst)).alias("u"),
                         F.greatest(F.col(src), F.col(dst)).alias("v"))
                 .filter(F.col("u") != F.col("v"))
                 .distinct())


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(N(u) ∪ {u}). Emits (v, m) for v in N(u), v > u; m ≤ u < v
    always, so the emitted pair is already canonical (m, v)."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (sym.groupBy("u").agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("mn"), F.col("u")).alias("m")))
    return (sym.join(m, "u")
               .filter(F.col("v") > F.col("u"))
               .select(F.col("m").alias("u"), F.col("v"))
               .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Direct each edge from the larger endpoint a to the smaller b;
    for each a: connect a and all its smaller neighbors to the
    minimum smaller neighbor."""
    d = e.select(F.col("v").alias("a"), F.col("u").alias("b"))  # a > b
    m = d.groupBy("a").agg(F.min("b").alias("m"))
    nbrs = (d.join(m, "a")
             .select(F.col("b").alias("x"), "m")
             .union(m.select(F.col("a").alias("x"), "m")))
    return (nbrs.filter(F.col("x") != F.col("m"))
                .select(F.least("x", "m").alias("u"),
                        F.greatest("x", "m").alias("v"))
                .distinct())


def _sig(e: DataFrame) -> tuple:
    """Order-invariant signature of an edge set: (count, bit_xor of
    per-edge xxhash64 — XOR is commutative and cannot overflow under
    ANSI mode, and the edges are distinct so nothing self-cancels). One
    aggregate job; only two scalars reach the driver — and running it
    is also what materializes the frame's persist()."""
    row = e.agg(F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64("u", "v")).alias("h")).first()
    return (row["n"], row["h"])


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 50,
                         ) -> DataFrame:
    """Label every vertex that appears in ``edges`` with the minimum
    vertex id of its connected component.

    Returns ``(id, component)`` — roots label themselves. Vertices with
    no edges are absent (callers union isolated vertices as their own
    component; see :func:`dedup_canonical`).

    Termination: the star alternation is a monotone contraction whose
    only fixed points are disjoint component-stars (Kiveris et al. §3),
    so the loop stops when a round leaves the edge-set signature
    unchanged — one aggregate job per round, vs. re-deriving the
    stars-shape predicate with extra join/isEmpty jobs.

    Each round is cut off from the last with ``localCheckpoint`` — the
    round's output becomes a materialized RDD with NO logical-plan
    dependency on prior rounds. persist/unpersist is NOT enough here:
    ``Dataset.unpersist`` is non-cascading, which *rebuilds* (drops the
    buffers of) every dependent cache entry, so round r would recompute
    the whole r-deep lineage — measured exponential blow-up by round 3.
    Lineage truncation is how GraphFrames' connectedComponents handles
    the same loop (its checkpointInterval). Trade-off: a lost executor
    can't recompute a truncated partition, so a failure mid-loop fails
    the job and the caller reruns it — the right call for an operator
    whose rounds are each a tiny fraction of total pipeline cost.
    Superseded rounds' checkpoint blocks are reclaimed by the context
    cleaner once the dropped Dataset reference is GC'd (same lifecycle
    GraphFrames relies on); each block is O(edges), MEMORY_AND_DISK.
    """
    e = _canon(edges, src, dst).localCheckpoint(eager=True)
    sig = _sig(e)
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # e2 is eagerly materialized with NO lineage back to e, so e's
        # checkpoint blocks can be dropped deterministically right here
        # (waiting for the JVM context cleaner leaves superseded rounds
        # pinning executor memory until some later GC — the flake a
        # zero-persisted-RDDs assertion catches)
        _drop_checkpoint(e)
        sig2 = _sig(e2)
        e, converged = e2, sig2 == sig
        sig = sig2
        if converged:
            break
    else:
        _drop_checkpoint(e)  # abort path must not leak the last round
        raise RuntimeError(f"connected_components: no convergence "
                           f"in {max_iter} rounds")
    # the result reads from the final checkpointed edge set; register it
    # with dedup's cache registry for lifecycle parity with the LSH
    # intermediates (release_caches() pops the reference; the blocks are
    # then GC-reclaimed by the context cleaner — for a checkpointed
    # frame unpersist() itself is a no-op).
    from tinyetl_spark.operators.dedup import _live_caches
    _live_caches.append(e)
    members = e.select(F.col("v").alias("id"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("id"),
                     F.col("u").alias("component")).distinct()
    return members.union(roots)


def dedup_canonical(df: DataFrame, pairs: DataFrame, id_col: str,
                    a_col: str = "doc_a", b_col: str = "doc_b",
                    ) -> DataFrame:
    """Cluster-level dedup: assign every row of ``df`` its component in
    the near-dup graph ``pairs`` (isolated rows are their own
    component) and flag the canonical keeper (minimum id — the
    deterministic choice both engines agree on).

    Output: ``df``'s columns + ``component`` + ``is_canonical``. The
    cleaned corpus is ``.filter("is_canonical")``.
    """
    comp = connected_components(pairs, a_col, b_col)
    return (df.join(comp.withColumnRenamed("id", id_col), id_col, "left")
              .withColumn("component",
                          F.coalesce("component", F.col(id_col)))
              .withColumn("is_canonical",
                          (F.col(id_col) == F.col("component"))))
