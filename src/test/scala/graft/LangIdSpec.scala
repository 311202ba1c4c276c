package graft

import graft.operators.LangId
import org.scalatest.funsuite.AnyFunSuite

/** LangId: trigram profiles must separate a synthetic corpus with
  * distinct character distributions (the fixture corpus is degenerate
  * for content-based langid — same vocabulary for every lang). */
class LangIdSpec extends AnyFunSuite with SparkFixture {

  private val english = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a stream of data flows through the query engine",
    "the window function ranks rows within each group")
  private val pseudoGerman = Seq(
    "die schnelle braune katze springt ueber den zaun",
    "der strom von daten fliesst durch die maschine",
    "das fenster zaehlt die zeilen in jeder gruppe")
  private val pseudoSpanish = Seq(
    "el rapido zorro marron salta sobre el perro",
    "una corriente de datos fluye por la maquina",
    "la ventana ordena las filas dentro del grupo")

  test("trigram profiles classify a held-out separable corpus") {
    import spark.implicits._
    val train =
      (english.take(2).map("en" -> _) ++
        pseudoGerman.take(2).map("de" -> _) ++
        pseudoSpanish.take(2).map("es" -> _)).toDF("lang", "text")
    val test_ = Seq(
      (0L, english(2), "en"),
      (1L, pseudoGerman(2), "de"),
      (2L, pseudoSpanish(2), "es"))
    val docs = test_.map(t => (t._1, t._2)).toDF("doc_id", "text")
    val got = LangId.classify(docs, LangId.profiles(train))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = test_.map(t => t._1 -> t._3).toMap
    assert(got == want)
  }

  test("classification is deterministic and total (one lang per doc)") {
    import spark.implicits._
    val train = (english.map("en" -> _) ++ pseudoGerman.map("de" -> _))
      .toDF("lang", "text")
    val docs = (english ++ pseudoGerman).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = LangId.classify(docs, LangId.profiles(train)).collect()
    assert(out.length == english.size + pseudoGerman.size)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
  }
}
