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
