package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator/query in the engine's surface (SURVEY.md §2).
  *
  * The reference repo (/root/reference, IsuraNimalasri/us-crypto-zillqa-etl)
  * contains no code (README.md:1-2 is its entire content), so the operator
  * inventory is defined by SURVEY.md §2 — each entry here is one §2 row.
  *
  * @param name   stable query id (SURVEY.md §2 row name)
  * @param build  (spark, sfDir) => result DataFrame; reads parquet under sfDir
  * @param oracle DuckDB 1.0 ANSI-SQL twin producing identical rows/columns;
  *               None for ops not bit-stably expressible in DuckDB (T-rows)
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Registry of every implemented operator. SparkEntry derives its `queries`
  * and `oracleSql` maps from this. */
object Catalog {
  val all: Vector[Q] =
    operators.ScanQueries.all ++
      sources.SourceQueries.all ++
      operators.JoinQueries.all ++
      operators.CdcQueries.all ++
      operators.AggQueries.all ++
      operators.WindowQueries.all ++
      operators.SortSetQueries.all ++
      operators.AnalyticsQueries.all ++
      operators.LayoutQueries.all ++
      operators.ReshapeQueries.all ++
      functions.ScalarFuncQueries.all ++
      operators.TextQueries.all ++
      operators.BpeTokenizer.all ++
      operators.UnigramLm.all ++
      operators.DedupQueries.all ++
      operators.SkewJoin.all ++
      operators.GraphQueries.all ++
      operators.VectorQueries.all ++
      operators.PqQuantizer.all ++
      operators.Pca.all ++
      operators.PrepQueries.all ++
      operators.DqQueries.all ++
      operators.StatQueries.all ++
      operators.StatTestQueries.all ++
      operators.RagPipeline.all ++
      operators.RecursiveQueries.all ++
      operators.RiskQueries.all ++
      operators.SurvivalQueries.all ++
      Vector(functions.CountMin.qAggCountmin,
        functions.QDigest.qAggQdigest) ++
      streaming.StreamingQueries.all ++
      streaming.StreamJoinQueries.all ++
      streaming.StreamVecIndex.all ++
      streaming.IvfRefit.all ++
      streaming.PqRefit.all ++
      streaming.StreamVecSearch.all ++
      streaming.StreamCorpusDedup.all ++
      streaming.StreamSpanDedup.all ++
      streaming.StreamGdpr.all ++
      streaming.StreamPhashDedup.all ++
      streaming.ModelRefit.all ++
      streaming.TokenizerRefit.all ++
      streaming.StreamIngest.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")
}
