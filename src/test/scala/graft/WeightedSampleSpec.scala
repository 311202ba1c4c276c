package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for q_sample_weighted (TextQueries.scala): the max-of-w-uniforms
  * key recomputed independently in plain Scala, and the property the row
  * exists for — selection provably biases toward heavy (long) docs. */
class WeightedSampleSpec extends AnyFunSuite with SparkFixture {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("selection equals a full Scala recomputation of the A-ES keys") {
    val s = spark
    import s.implicits._
    val corpus = Tables.documents(s, sfDir)
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect()
    val keyed = corpus.map { case (id, nc) =>
      val w = nc / 16 + 1
      val k = (1L to w).map(j => md5hex(s"${id}_$j")).max
      (id, w, k)
    }
    val expect = keyed.sortBy { case (id, _, k) => (k, -id) }(
      Ordering.Tuple2(Ordering[String].reverse, Ordering[Long].reverse))
      .take(100)
    val got = Catalog.byName("q_sample_weighted").build(s, sfDir)
      .select($"doc_id", $"w", $"k")
      .as[(Long, Long, String)].collect()
    assert(got.length == 100)
    assert(got.map(t => (t._1, t._3)).toSeq ==
      expect.map(t => (t._1, t._3)).toSeq,
      "operator selection must equal the independent key recomputation")
    assert(got.map(_._2).toSeq == expect.map(_._2).toSeq)
  }

  test("selection biases toward heavy docs (the point of weighting)") {
    val s = spark
    import s.implicits._
    val all = Tables.documents(s, sfDir)
      .select((org.apache.spark.sql.functions.expr("n_chars div 16") + 1))
      .as[Long].collect()
    val sel = Catalog.byName("q_sample_weighted").build(s, sfDir)
      .select($"w").as[Long].collect()
    val meanAll = all.sum.toDouble / all.length
    val meanSel = sel.sum.toDouble / sel.length
    assert(meanSel > meanAll,
      s"weighted sample mean weight $meanSel must exceed corpus mean " +
        s"$meanAll — otherwise the weights did nothing")
  }
}
