package graft

/** Local profiling loop: time one catalog query over N warm reps.
  * Usage: runMain graft.PrTime <query> [sfDir] [reps]
  * Complements Bench (the driver's whole-catalog run) when iterating on a
  * single row — first build warms caches, the timed reps are cache-warm,
  * matching the driver's warm-pass protocol. */
object PrTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val q = Catalog.byName(name)
    q.build(s, dir).count() // warm: caches, codegen, file listing
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      q.build(s, dir).count()
      println(s"rep$i: ${(System.nanoTime() - t0) / 1e9}")
    }
    s.stop()
  }
}
