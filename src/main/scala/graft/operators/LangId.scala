package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character-n-gram language identification (LLM-data-pipeline north
  * star: text analysis). Train per-language trigram log-probability
  * profiles from a labeled corpus, classify by naive-Bayes-style
  * additive scoring over matched grams.
  *
  * NOT registered as a fixture query: the fixture corpus draws the same
  * 31-word vocabulary for every `lang` value, so content-based langid is
  * degenerate there by construction (SURVEY §2.10b note). `LangIdSpec`
  * pins behavior on a synthetic separable corpus.
  *
  * Scale notes (100 TB): gram extraction is a per-row Generator; the
  * profile table is vocabulary-bounded (|langs| × |grams|) and
  * broadcast; scoring is one shuffle on doc_id with partial aggregation.
  */
object LangId {

  val gram = 3

  /** (doc_id-ish id column, text) → one row per char trigram occurrence. */
  private def grams(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol), lower(col("text")).as("t"))
      .select(col(idCol),
        explode(expr(s"sequence(1, greatest(length(t) - ${gram - 1}, 1))"))
          .as("pos"),
        col("t"))
      .select(col(idCol), expr(s"substring(t, pos, $gram)").as("g"))

  /** Train per-language trigram log-prob profiles from (lang, text). */
  def profiles(labeled: DataFrame): DataFrame = {
    val counts = grams(labeled, "lang")
      .groupBy(col("lang"), col("g"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("lang")).agg(sum(col("c")).as("n"))
    counts.join(totals, "lang")
      .select(col("lang"), col("g"),
        log(col("c").cast("double") / col("n")).as("logp"))
  }

  /** Log-prob floor for grams unseen in a language's profile — must sit
    * below any trained logp, else "fewest matches wins" (negative logs
    * reward non-matching under matched-only scoring). */
  val unseenLogp = -12.0

  /** Classify (doc_id, text) rows against trained profiles: returns
    * (doc_id, lang, score) with the argmax language per doc. Every gram
    * is scored against every candidate language (langs × grams via a
    * broadcast of the tiny lang list), with unseen grams at the floor. */
  def classify(docs: DataFrame, profs: DataFrame): DataFrame = {
    val langs = profs.select(col("lang")).distinct()
    val scored = grams(docs, "doc_id")
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(langs))
      .join(broadcast(profs), Seq("lang", "g"), "left")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c") * coalesce(col("logp"), lit(unseenLogp))).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("lang"))
    scored
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("lang"), round(col("score"), 6).as("score"))
  }
}
