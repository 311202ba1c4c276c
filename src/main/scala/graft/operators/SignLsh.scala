package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane (sign) LSH over a 64-dim float embedding column.
  *
  * `bits` sign-bits of dot products with fixed seeded hyperplanes
  * coarse-quantize vectors into 2^bits buckets. Two usage shapes:
  *
  *  - Single-table multi-probe kNN ([[VectorQueries.AnnLsh]]): a probe
  *    searches its own bucket plus all Hamming-distance-1 neighbors, so
  *    candidate generation is an equi join on the bucket key that scans
  *    ~(bits+1)/2^bits of the table.
  *  - Banded multi-table pair generation ([[EmbeddingDedup]]): L
  *    independent bands of b bits each; a pair is a candidate iff it
  *    collides in at least one band — the same AND-over-bits /
  *    OR-over-bands construction as MinHash-LSH and SimHash banding.
  *
  * Scale rule (100 TB): pruning only sharpens with corpus size if `bits`
  * grows with it — pick bits ≈ log2(n / targetBucketSize) via [[SignLsh
  * .bitsFor]] (e.g. n = 10^11 vectors, 10^5-row buckets → 20 bits), so
  * expected bucket size — and hence candidate-pair volume per bucket —
  * stays constant as n grows. A fixed bit width (the r4 design: 4 bits =
  * 16 buckets forever) makes pair volume O(n²/2^bits): quadratic in
  * disguise. Hyperplanes are seeded, so bucketing is deterministic
  * across sessions, executors, and retries.
  */
class SignLsh(val bits: Int, val seed: Long = 42L) {
  require(bits >= 1 && bits <= 30, s"bits must be in [1, 30], got $bits")

  /** Fixed hyperplanes (seeded — identical across sessions/executors). */
  val planes: Seq[Seq[Double]] = SignLsh.planes(bits, seed)

  private def dot(a: String, b: String) = expr(s"vec_dot($a, $b)")

  /** Adds the integer `bucket` column (bits sign bits). Planes are bound
    * as literal columns first so the codegen'd vec_dot applies. */
  def bucketed(df: DataFrame): DataFrame = {
    val withPlanes = planes.zipWithIndex.foldLeft(df) { case (d, (p, j)) =>
      d.withColumn(s"_plane$j", typedLit(p.map(_.toFloat)))
    }
    val bitCols = (0 until bits).map { j =>
      when(dot("embedding", s"_plane$j") >= 0, 1 << j).otherwise(0)
    }
    withPlanes
      .withColumn("bucket", bitCols.reduce(_ + _))
      .drop((0 until bits).map(j => s"_plane$j"): _*)
  }

  /** The probe's multi-probe set: own bucket + Hamming-1 neighbors. */
  def probeBuckets(bucket: Column): Column =
    array(bucket +: (0 until bits).map(j => bucket.bitwiseXOR(lit(1 << j))): _*)
}

object SignLsh {
  /** `count` fixed seeded hyperplanes — the shared generator for the
    * single-table (class above) and banded ([[VectorQueries
    * .EmbeddingDedup]]) shapes; banded use is not subject to the 30-bit
    * bucket-packing cap since only bitsPerBand bits form one key. */
  def planes(count: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(count)(Seq.fill(64)(rnd.nextGaussian()))
  }

  /** Sizing rule: bits so that the expected bucket holds ~targetBucketSize
    * vectors — keeps per-bucket candidate volume constant as n grows. */
  def bitsFor(n: Long, targetBucketSize: Long): Int = {
    require(n > 0 && targetBucketSize > 0)
    val b = math.ceil(math.log(n.toDouble / targetBucketSize) / math.log(2.0)).toInt
    math.max(1, math.min(30, b))
  }
}
