package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators over the documents corpus — SURVEY.md §2.10
  * rows 46–48 (LLM-data-pipeline north star).
  *
  * Scale notes (100 TB): tokenization is a per-row Generator (explode) —
  * embarrassingly parallel, no shuffle. The two-level wordcount (#47)
  * partial-aggregates (doc_id, term) before the shuffle, and the corpus
  * side collapses to the vocabulary (31 terms, FIXTURES.md) — broadcast.
  * #48 is a plain partial+final hash agg on (lang, source) (≤100 groups).
  */
object TextQueries {

  /** #46 q_text_tokenize_explode — whitespace tokenizer, one row per
    * (doc, token) occurrence. Duplicate rows are identical, so ORDER BY
    * (doc_id, tok) is still a total order of row *values* (rule 1). */
  val qTextTokenizeExplode: Q = Q(
    "q_text_tokenize_explode",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", explode(split($"text", " ")).as("tok"))
        .orderBy($"doc_id", $"tok")
    },
    oracle = Some(
      """SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |FROM documents
        |ORDER BY doc_id, tok""".stripMargin))

  /** #47 q_text_wordcount_tf — per-doc top term by tf (term tiebreak)
    * joined with that term's corpus-wide count. */
  val qTextWordcountTf: Q = Q(
    "q_text_wordcount_tf",
    (s, dir) => {
      import s.implicits._
      val toks = Tables.documents(s, dir)
        .select($"doc_id", explode(split($"text", " ")).as("term"))
      val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val corpus = toks.groupBy($"term").agg(count(lit(1)).as("corpus_cnt"))
      val w = Window.partitionBy($"doc_id").orderBy($"tf".desc, $"term")
      tf.withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        // corpus side = vocabulary-sized (31 terms at any SF) — broadcast.
        .join(broadcast(corpus), "term")
        .select($"doc_id", $"term", $"tf", $"corpus_cnt")
        .orderBy($"doc_id")
    },
    oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
        |corpus AS (SELECT term, COUNT(*) AS corpus_cnt FROM toks GROUP BY term),
        |top AS (SELECT doc_id, term, tf,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS rn FROM tf)
        |SELECT doc_id, term, tf, corpus_cnt
        |FROM top JOIN corpus USING (term) WHERE rn = 1
        |ORDER BY doc_id""".stripMargin))

  /** #48 q_text_stats — per (lang, source): doc count, rounded average
    * length (exact int sum / count, rule 3), and length-bucket counts. */
  val qTextStats: Q = Q(
    "q_text_stats",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy($"lang", $"source")
        .agg(
          count(lit(1)).as("n_docs"),
          round(sum($"n_chars").cast(DoubleType) / count(lit(1)), 4)
            .as("avg_chars"),
          sum(when($"n_chars" < 200, 1L).otherwise(0L)).as("n_short"),
          sum(when($"n_chars" >= 200 && $"n_chars" < 300, 1L).otherwise(0L))
            .as("n_mid"),
          sum(when($"n_chars" >= 300, 1L).otherwise(0L)).as("n_long"))
        .orderBy($"lang", $"source")
    },
    oracle = Some(
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars,
        |  COUNT(*) FILTER (WHERE n_chars < 200) AS n_short,
        |  COUNT(*) FILTER (WHERE n_chars >= 200 AND n_chars < 300) AS n_mid,
        |  COUNT(*) FILTER (WHERE n_chars >= 300) AS n_long
        |FROM documents
        |GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin))

  val all: Vector[Q] =
    Vector(qTextTokenizeExplode, qTextWordcountTf, qTextStats)
}
