package graft

import org.apache.spark.sql.SparkSession

/** Inner-loop companion to [[Bench]]: time only the catalog rows whose
  * name contains the given substring, with a warm pass first — the
  * per-family probe used while optimizing one row (the full Bench run
  * costs minutes of warmup before the first timed rep). Same session
  * shape as Bench; prints one line per query (min/median of 3 reps),
  * not the driver JSON contract.
  *
  *   sbt 'runMain graft.BenchFilter q_stream /root/testdata/sf0.1'
  */
object BenchFilter {
  def main(args: Array[String]): Unit = {
    val filter = args.headOption.getOrElse("")
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    // A/B experimentation knob (diagnostic tool only, never the bench):
    //   SPARK_GRAFT_CONF='k=v;k=v'
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) b = b.config(kv.take(i), kv.drop(i + 1))
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.filter(_.contains(filter)).toSeq.sorted
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable =>
        println(s"WARMFAIL $n ${e.getMessage.take(120)}") }
    }
    var total = 0.0
    names.foreach { n =>
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      total += ts.sorted.apply(1)
      println(f"BENCHFILTER $n%-28s min ${ts.min}%.3f med ${ts.sorted.apply(1)}%.3f")
    }
    println(f"BENCHFILTER TOTAL(med) $total%.2f s over ${names.size} queries")
    spark.stop()
  }
}
