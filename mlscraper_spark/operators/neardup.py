"""Banded-LSH near-duplicate detection over integer fingerprints.

The scale shape for pHash / SimHash dedup at 10^10 rows: explode each
fingerprint into ``n_bands`` contiguous bit-bands and equi-join on
``(band, val)``.  This is an *exact-cover* LSH — by pigeonhole, any pair
within Hamming distance ``< n_bands`` agrees on at least one whole band,
so recall is 100% for ``max_hamming <= n_bands - 1`` while the join stays
bucket-sized, never all-pairs (mirroring q19's MinHash banding and q22's
sign-LSH for embeddings, but over the 64-bit pHash column the input_hint
mandates).  Verification — ``bit_count(fp_a XOR fp_b)`` — is a pure JVM
expression bounded by the candidate count; no UDF anywhere.

Instantiated two ways:
- q35 runs it over a 32-bit SimHash so DuckDB can replay every step
  (parity-gated end to end);
- tests/test_images.py runs it over *real* 64-bit image pHashes and checks
  the pair set equals the brute-force all-pairs answer.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlscraper_spark import caches


def fingerprint_neardup(df: DataFrame, id_col: str, fp_col: str, *,
                        n_bits: int = 64, n_bands: int = 4,
                        max_hamming: int = 3) -> DataFrame:
    """All pairs ``(id_a < id_b)`` whose fingerprints differ in at most
    ``max_hamming`` bits, found via banded LSH + exact popcount verify.

    Returns columns ``(id_a, id_b, hamming)``.  Exact (no false negatives)
    whenever ``max_hamming < n_bands``; asserted because silently lossy
    recall is the classic LSH footgun.
    """
    if n_bits % n_bands != 0:
        raise ValueError("n_bits must be divisible by n_bands")
    if max_hamming >= n_bands:
        raise ValueError(
            "exact recall needs max_hamming < n_bands (pigeonhole); "
            f"got max_hamming={max_hamming}, n_bands={n_bands}"
        )
    bw = n_bits // n_bands
    mask = (1 << bw) - 1
    # shiftrightunsigned: the top band of a *signed* 64-bit pHash must not
    # smear the sign bit into the band value.
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("_fp"), b * bw)
             .bitwiseAND(F.lit(mask)).alias("val"),
        )
        for b in range(n_bands)
    ])
    ex = (
        df.select(F.col(id_col).alias("_id"), F.col(fp_col).alias("_fp"))
          .select("_id", "_fp", F.explode(bands).alias("bv"))
          .select("_id", "_fp", "bv.band", "bv.val")
    )
    left = ex.select(F.col("_id").alias("id_a"), F.col("_fp").alias("fp_a"),
                     "band", "val")
    right = ex.select(F.col("_id").alias("id_b"), F.col("_fp").alias("fp_b"),
                      "band", "val")
    cand = (
        left.join(right, ["band", "val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "fp_a", "fp_b")
            .distinct()  # a pair may collide in several bands — count once
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("int")
    return (
        cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming")
    )


def dedup_clusters(pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b",
                   *, max_iters: int = 50) -> DataFrame:
    """Connected components over an undirected near-dup pair list, with
    survivor election: returns ``(doc_id, cluster_id, is_survivor)`` where
    ``cluster_id`` is the component's minimum doc id and the survivor is
    the one doc per cluster to KEEP (every near-dup query q19/q27/q30/q35
    stops at pairs; corpus dedup needs the transitive closure — with
    A~B~C, pair-wise survivor-keeping drops or double-keeps documents).

    Iterative min-label propagation via hash joins: each round every node
    takes the min label over itself and its neighbors, so labels converge
    in O(component diameter) rounds.  Near-dup components are shallow by
    construction (pairs arise from shared bands/shingles, so components
    are dense), which is why plain propagation is the right Spark shape
    here over the asymptotically-stronger large-star/small-star
    alternating rounds (Kiveris et al., MapReduce & Beyond 2014) — those
    drop in as the loop body unchanged if adversarial diameters appear.

    Scale shape: each round is ONE shuffle (edge⋈label hash join on the
    node key) + ONE hash aggregation; the convergence check is a scalar
    count, never a driver-side collect of rows.  Labels are
    ``localCheckpoint``-ed every round — iterative self-referencing joins
    grow the logical plan EXPONENTIALLY in the round count, and by ~10
    rounds merely formatting the plan OOMs the driver; eager lineage
    truncation keeps the plan O(1) per round (on a production cluster
    with executor churn, point ``spark.sparkContext.setCheckpointDir`` at
    durable storage and swap in ``.checkpoint()``).

    Storage is bounded at TWO rounds' worth of label blocks, not
    O(rounds): each superseded round's checkpoint blocks are unpersisted
    as soon as the next round has materialized and the convergence count
    has read them (nothing references them after that — checkpointed
    lineage is truncated, so the new round never recomputes through the
    old one), and ``edges`` is dropped on return.  The FINAL round's
    blocks must outlive this function (the caller consumes the returned
    frame), so they are registered with ``caches.register`` and freed at
    the next ``caches.release_caches()`` — the round-3 leak was exactly
    these handles accumulating un-releasably across the parity run."""
    edges, edges_h = _eager_local_checkpoint(
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels, labels_h = _eager_local_checkpoint(
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("lab", F.col("doc_id"))
    )
    converged = False
    for _ in range(max_iters):
        prop = edges.join(labels, edges["a"] == labels["doc_id"]).select(
            F.col("b").alias("doc_id"), "lab"
        )
        new, new_h = _eager_local_checkpoint(
            labels.unionByName(prop)
            .groupBy("doc_id")
            .agg(F.min("lab").alias("lab"))
        )
        changed = (
            new.join(labels.withColumnRenamed("lab", "old"), "doc_id")
            .filter(F.col("lab") < F.col("old"))
            .count()
        )
        _unpersist_handles(labels_h)  # superseded round — drop its blocks
        labels, labels_h = new, new_h
        if changed == 0:
            converged = True
            break
    _unpersist_handles(edges_h)
    if not converged:
        _unpersist_handles(labels_h)
        # min-label can only ever decrease, so non-convergence means the
        # diameter beats max_iters — surface it, never return wrong labels
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iters} rounds; "
            "raise max_iters or switch the loop body to large-star/small-star"
        )
    for h in labels_h:
        caches.register(h)
    return labels.select(
        "doc_id",
        F.col("lab").alias("cluster_id"),
        (F.col("doc_id") == F.col("lab")).alias("is_survivor"),
    )


def _eager_local_checkpoint(df: DataFrame):
    """``df.localCheckpoint(eager=True)`` plus release handles for the
    blocks it pins.

    ``localCheckpoint`` persists the physical RDD internally;
    ``DataFrame.unpersist()`` on the result cannot reach it (it only drops
    plan-level caches), so the blocks are otherwise unreleasable for the
    session's life.  The persisted RDD is captured by diffing the
    context's persistent-RDD registry around the call — single-threaded
    driver, so the diff is exactly this checkpoint's RDD(s) — and the
    returned py4j ``JavaRDD`` handles free the blocks via
    ``.unpersist()``."""
    jsc = df.sparkSession.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keys())
    out = df.localCheckpoint(eager=True)
    snap = dict(jsc.getPersistentRDDs())
    return out, [rdd for rid, rdd in snap.items() if rid not in before]


def _unpersist_handles(handles) -> None:
    for h in handles:
        h.unpersist()
