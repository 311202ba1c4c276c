package graft

/** Plan snapshot tool for the optimization rounds: print one catalog
  * query's `.explain("formatted")` physical plan (the judge-checkable
  * artifact committed under plans/r<N>/). Usage:
  *   runMain graft.PrPlan <query> [sfDir] [outFile]
  *   runMain graft.PrPlan <q1,q2,...> <sfDir> <outDir> <suffix>
  * The second form dumps many rows' plans from ONE session (a JVM +
  * warm-stage spin-up per row was the r15 reason no dumps got
  * committed) to `<outDir>/<query>_<suffix>.txt`.
  * The session mirrors Bench's conf (same master/shuffle defaults via
  * SPARK_GRAFT_CPUS) so the captured plan is the one the bench times.
  * Streaming replay rows build their REPORT DataFrame only after a
  * replay; PrPlan runs the row once (building state), then explains the
  * returned frame — the timed action's plan. */
object PrPlan {
  def main(args: Array[String]): Unit = {
    if (args.length >= 4 && args(0).contains(",")) { multi(args); return }
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val out = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val q = Catalog.byName(name)
    val df = q.build(s, dir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    out match {
      case Some(p) =>
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(p).getParent)
        java.nio.file.Files.writeString(java.nio.file.Paths.get(p), plan)
        println(s"PLAN_WRITTEN=$p")
      case None => println(plan)
    }
    s.stop()
  }

  /** Batch form: one session, many dumps. A row whose build fails must
    * not abort the remaining dumps — record the error in its file. */
  private def multi(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq.filter(_.nonEmpty)
    val dir = args(1)
    val outDir = java.nio.file.Paths.get(args(2))
    val suffix = args(3)
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val p = outDir.resolve(s"${name}_$suffix.txt")
      val text =
        try Catalog.byName(name).build(s, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        catch { case e: Throwable =>
          s"PLAN_FAILED ${e.getClass.getName}: ${e.getMessage}\n" }
      java.nio.file.Files.writeString(p, text)
      println(s"PLAN_WRITTEN=$p")
    }
    s.stop()
  }
}
