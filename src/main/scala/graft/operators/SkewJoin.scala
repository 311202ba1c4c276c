package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi joins (100 TB toolkit; SURVEY §2.3 scale
  * notes). AQE's runtime skew-join split handles most cases, but when one
  * hot key dominates a fact⋈fact join, salting pre-spreads it: the skewed
  * side gets a random-but-deterministic salt in [0, n), the other side
  * explodes each row to all n salts, and the join key becomes (key, salt)
  * — the hot key's rows land on n shuffle partitions instead of one.
  *
  * The salt is `pmod(hash(unique tiebreak cols), n)` — deterministic, so
  * results are reproducible run-to-run (no rand(): nondeterministic
  * expressions would also break retry semantics at scale).
  */
object SkewJoin {

  /** Inner equi join of `skewed` and `other` on `key`, with the skewed
    * side salted `n` ways using `tiebreak` columns for the deterministic
    * salt. Result columns = skewed.* ++ other.* (minus the duplicate
    * key), same as a plain inner join on the key. */
  def saltedInnerJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      n: Int,
      tiebreak: Seq[String]): DataFrame = {
    require(n > 0)
    val salted = skewed.withColumn("_salt",
      pmod(hash(tiebreak.map(col): _*), lit(n)))
    val exploded = other.withColumn("_salt",
      explode(array((0 until n).map(lit): _*)))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }
}
