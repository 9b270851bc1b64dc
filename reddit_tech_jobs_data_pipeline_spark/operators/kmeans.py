"""Lloyd's k-means as iterative DataFrame operations.

The scale-out clustering primitive a training-data pipeline uses for
corpus bucketing / IVF coarse quantizers (operators/similarity.py
ivf_ann_topk uses training-free cells; this is the trained variant).
No MLlib, no RDDs: assignment is a broadcast join against the (tiny)
centroid table + an argmin window; the update step folds member vectors
element-wise.

Determinism contract (what lets the DuckDB oracle match bit-for-bit):
* init = the k lowest-vec_id vectors (no RNG);
* every per-vector fold (distance, member-sum) is a SEQUENTIAL left
  fold in a fixed order — `F.aggregate` over `zip_with` for distances,
  and member vectors folded in vec_id order — so both engines execute
  the identical IEEE-754 operation sequence; no rounding is needed
  anywhere inside the loop;
* argmin tie-break by (dist, cid).

Scale notes (100 TB): the assignment join broadcasts k·dim doubles —
trivially small; the shuffle is the per-cluster update aggregation.
The ordered collect_list fold is the *oracle-parity* update;
``commutative=True`` provides the at-scale variant in code — posexplode
→ groupBy(cid, dim) → sum (order-free map-side partial aggregation,
no per-cluster membership array) — same algorithm, commutative
reduction, tested against the ordered fold under float tolerance.
Iterations are driver-side loop unrolling (k-means iteration count is
small and fixed) with a localCheckpoint every 4 iterations to truncate
lineage on deep runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _sq_dist(a: Column, b: Column) -> Column:
    # sequential left fold: bit-identical to the oracle's list_reduce
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest centroid per vector: collapse the (tiny) centroid table
    to ONE array row, broadcast it, and take the argmin with a
    higher-order-function fold — a map-only projection over the vectors.

    The former shape (broadcast join ×k row explosion + a
    row_number window partitioned by vec_id) shuffled |vecs|·k rows and
    sorted them just to keep one; this computes the same argmin with
    ZERO exchanges on the vector side (r14, guide §2.4). Every
    per-centroid distance is the identical `_sq_dist` sequential fold,
    and `array_min` over (dist, cid) structs is exactly the old
    (dist asc, cid asc) tie-break — a unique total order, so the result
    is independent of the array's element order and bit-identical to
    the window form (oracle-gated by every kmeans/PQ/SemDeDup query).

    The argmin is a CPU-bound NARROW stage, so callers whose vecs come
    straight off a small scan should ``fan_out`` them first (lloyd_kmeans
    does this ONCE at entry — hoisted r15 per r14 ADVICE: calling it here
    forced physical planning of the growing iterative plan every
    iteration and, on small inputs, a fresh repartition per round)."""
    cent_arr = centroids.agg(
        F.collect_list(F.struct("cid", "cvec")).alias("__cents")
    )
    scored = F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            _sq_dist(F.col("v"), c["cvec"]).alias("dist"), c["cid"].alias("cid")
        ),
    )
    return (
        vecs.join(F.broadcast(cent_arr))
        .select("vec_id", "v", F.array_min(scored)["cid"].alias("cid"))
        .filter(F.col("cid").isNotNull())
    )


def update_centroids(assigned: DataFrame, dim: int, commutative: bool = False) -> DataFrame:
    """Element-wise mean per cluster.

    Default: fold members in vec_id order (sequential, oracle-parity) —
    a cluster's whole membership becomes one array, which is the skew
    amplifier at scale. ``commutative=True`` is the 100 TB update:
    posexplode each vector and sum per (cid, dim) — map-side partial
    aggregation, no per-cluster array, shuffle rows ∝ n·dim scalars —
    then re-assemble the centroid with array_agg in dim order. Results
    differ only by float reassociation noise; tests pin both paths
    against each other under tolerance."""
    if commutative:
        exploded = assigned.select(
            "cid", "vec_id", F.posexplode("v").alias("pos", "x")
        )
        dims = (
            exploded.groupBy("cid", "pos")
            .agg(F.sum("x").alias("sx"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "sx"))),
                    lambda s: s["sx"],
                ).alias("sums")
            )
        )
        counts = assigned.groupBy("cid").agg(
            F.count(F.lit(1)).alias("n"), F.sum("vec_id").alias("vid_sum")
        )
        return counts.join(dims, "cid").select(
            "cid",
            "n",
            "vid_sum",
            F.transform("sums", lambda s: s / F.col("n")).alias("cvec"),
        )
    zeros = F.array_repeat(F.lit(0.0), dim)
    grouped = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vec_id").alias("vid_sum"),
        F.array_sort(F.collect_list(F.struct("vec_id", "v"))).alias("members"),
    )
    summed = F.aggregate(
        F.transform(F.col("members"), lambda m: m["v"]),
        zeros,
        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
    )
    return grouped.select(
        "cid",
        "n",
        "vid_sum",
        F.transform(summed, lambda s: s / F.col("n")).alias("cvec"),
    )


def lloyd_kmeans(
    emb: DataFrame,
    k: int,
    dim: int,
    iterations: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    commutative: bool = False,
) -> DataFrame:
    """Run ``iterations`` rounds of assign+update from the deterministic
    init; returns (cid, n, vid_sum, cvec). Clusters that lose all
    members drop out (k shrinks) — deterministic on both engines.
    ``commutative=True`` uses the map-side-combined scale update (see
    ``update_centroids``); default is the bit-exact ordered fold."""
    if iterations < 1:
        raise ValueError("lloyd_kmeans requires iterations >= 1 (state is produced by the update step)")
    from reddit_tech_jobs_data_pipeline_spark.operators.parallelism import fan_out

    vecs = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    # the per-iteration assignment is a CPU-bound narrow stage; repair a
    # small scan's 1-split parallelism ONCE before the loop (was inside
    # assign_clusters, where every iteration re-planned and re-shuffled)
    vecs = fan_out(vecs)
    w = Window.orderBy("vec_id")
    centroids = (
        vecs.orderBy("vec_id")
        .limit(k)
        .select((F.row_number().over(w) - 1).alias("cid"), F.col("v").alias("cvec"))
    )
    state = None
    for it in range(iterations):
        assigned = assign_clusters(vecs, centroids)
        state = update_centroids(assigned, dim, commutative=commutative)
        centroids = state.select("cid", "cvec")
        # periodic lineage truncation (centroids are k rows — the
        # checkpoint is tiny) so deep runs keep an O(1) plan instead of
        # re-deriving every prior iteration inside each new one; values
        # are untouched, so oracle parity holds
        if (it + 1) % 4 == 0 and it + 1 < iterations:
            state = state.localCheckpoint()
            centroids = state.select("cid", "cvec")
    return state


def assign_clusters_two_level(
    vecs: DataFrame,
    centroids: DataFrame,
    dim: int,
    ncoarse: int | None = None,
    nprobe: int = 2,
    coarse_iters: int = 2,
) -> DataFrame:
    """APPROXIMATE nearest-centroid assignment via a two-level (IVF-style)
    quantizer — the scale path for the assignment term once k grows with
    the corpus (SemDeDup contract: k ~ N/C makes exact assignment
    O(N·k) = O(N²/C); this cuts it to O(N·(ncoarse + nprobe·k/ncoarse))
    ≈ O(N·√k) at the default ncoarse = ⌊√k⌋).

    Recipe (standard IVF coarse quantizer, trained on the FINE
    centroids themselves — a k-row table, so training is trivial):
      1. k-means the k fine centroids into ``ncoarse`` coarse cells;
      2. exact-assign each fine centroid to its coarse cell;
      3. route each vector to its ``nprobe`` nearest coarse cells;
      4. exact argmin over ONLY the fine centroids in those cells.
    Same output schema as ``assign_clusters`` (vec_id, v, cid) and the
    same (dist, cid) tie-break; differs only when a vector's true
    nearest fine centroid lives outside its nprobe coarse cells —
    boundary vectors. Measured agreement vs exact on the 10-gaussian
    test corpus (k=16): ~92% at nprobe=2, ~98% at nprobe=3 — the usual
    IVF recall dial (tests/test_semantic_dedup.py pins ≥95% at
    nprobe=3). Approximate ⇒ never wired into an
    oracle-gated catalog query; it is the documented-and-now-built
    escape hatch in SCALE.md's semantic_dedup analysis. All three
    per-vector steps are broadcast joins — zero shuffle on the corpus
    side beyond the final window's hash partition on vec_id."""
    # materialize the (k-row) centroid table ONCE: it feeds the ncoarse
    # probe, the coarse-quantizer training, and the fine join — if it
    # arrives as a lazy k-means plan, each of those would otherwise
    # re-run the full fine training (measured 3x training cost at sf1.0)
    centroids = centroids.localCheckpoint()
    if ncoarse is None:
        import math

        ncoarse = max(2, math.isqrt(centroids.count()))
    cent_as_vecs = centroids.select(
        F.col("cid").alias("vec_id"), F.col("cvec").alias("v")
    )
    coarse = lloyd_kmeans(
        cent_as_vecs, k=ncoarse, dim=dim, iterations=coarse_iters,
        id_col="vec_id", vec_col="v",
    ).select(F.col("cid").alias("cell_id"), F.col("cvec").alias("ccvec"))

    w_cent = Window.partitionBy("cid").orderBy(F.asc("cd"), F.asc("cell_id"))
    cent_cells = (
        centroids.crossJoin(F.broadcast(coarse))
        .withColumn("cd", _sq_dist(F.col("cvec"), F.col("ccvec")))
        .withColumn("__rn", F.row_number().over(w_cent))
        .filter(F.col("__rn") == 1)
        .select("cell_id", "cid", "cvec")
    )
    w_vec = Window.partitionBy("vec_id").orderBy(F.asc("cd"), F.asc("cell_id"))
    v_cells = (
        vecs.crossJoin(F.broadcast(coarse))
        .withColumn("cd", _sq_dist(F.col("v"), F.col("ccvec")))
        .withColumn("__rn", F.row_number().over(w_vec))
        .filter(F.col("__rn") <= nprobe)
        .select("vec_id", "v", "cell_id")
    )
    w_fine = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cid"))
    return (
        v_cells.join(F.broadcast(cent_cells), "cell_id")
        .withColumn("dist", _sq_dist(F.col("v"), F.col("cvec")))
        .withColumn("__rn", F.row_number().over(w_fine))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "v", "cid")
    )
