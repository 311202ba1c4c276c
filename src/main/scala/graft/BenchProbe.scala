package graft

import org.apache.spark.sql.SparkSession

/** Per-job attribution probe, the measurement companion to
  * [[BenchFilter]] (guide §1: decide whether time goes to scheduling,
  * shuffle or compute before touching code): run ONE catalog row a few
  * times and print every Spark job the rep launched — wall duration,
  * stage/task counts — so a multi-job row (streaming replays, iterative
  * graph loops, state-table folds) is attributable job-by-job instead
  * of one opaque median.
  *
  *   sbt 'runMain graft.BenchProbe q_stream_span_dedup /root/testdata/sf0.1'
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: BenchProbe <query> [sfDir]"))
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
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
    spark.sparkContext.setLogLevel("ERROR")
    case class J(id: Int, var desc: String, t0: Long, var t1: Long,
      var stages: Int, var tasks: Int,
      durs: scala.collection.mutable.ArrayBuffer[Long] =
        scala.collection.mutable.ArrayBuffer.empty)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]
    // Tasks attribute to their job through the stageId→jobId map each
    // JobStart declares (r15 advice: "latest job" attribution landed
    // tasks on the wrong job whenever jobs overlap — AQE stage-by-stage
    // and streaming folds, exactly the multi-job rows this tool probes).
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]
    val recording = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (recording.get()) {
            val d = Option(e.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .filter(_.nonEmpty)
              .getOrElse(e.stageInfos.map(_.name.takeWhile(_ != '\n'))
                .distinct.mkString(" | ").take(140))
            jobs.put(e.jobId,
              J(e.jobId, d, e.time, e.time, e.stageIds.size, 0))
            e.stageIds.foreach(sid => stageJob.put(sid, e.jobId))
            ()
          }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val j = jobs.get(e.jobId)
          if (j != null) j.t1 = e.time
        }
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val jid = stageJob.get(e.stageId)
          val j = if (stageJob.containsKey(e.stageId)) jobs.get(jid) else null
          if (j != null) {
            j.tasks += 1
            if (e.taskInfo != null) j.durs += e.taskInfo.duration
          }
        }
      })
    val fn = SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(s"unknown query $name"))
    // warm rep
    fn(spark, sfDir).count()
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "2").toInt
    (1 to reps).foreach { r =>
      jobs.clear()
      stageJob.clear()
      recording.set(true)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // Drain the async listener bus before reading: tail task/jobEnd
      // events otherwise drop or bleed into the next rep (r15 advice).
      // listenerBus is private[spark] — reflection, with a bounded
      // sleep as the can't-resolve fallback (diagnostic tool only).
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: Throwable => Thread.sleep(300) }
      recording.set(false)
      import scala.jdk.CollectionConverters._
      val js = jobs.values().asScala.toSeq.sortBy(_.t0)
      val sumJobs = js.map(j => (j.t1 - j.t0) / 1e3).sum
      println(f"PROBE $name rep $r wall $wall%.3f s, ${js.size} jobs, " +
        f"job-time sum $sumJobs%.3f s (gaps ${wall - sumJobs}%.3f s)")
      js.foreach { j =>
        val ds = j.durs.sorted
        val med = if (ds.isEmpty) 0L else ds(ds.size / 2)
        val mx = if (ds.isEmpty) 0L else ds.last
        val sum = ds.sum
        println(f"PROBE   job ${j.id}%4d ${(j.t1 - j.t0) / 1e3}%7.3f s " +
          f"stages ${j.stages}%2d tasks ${j.tasks}%4d " +
          f"taskSum ${sum / 1e3}%7.3f med ${med / 1e3}%6.3f " +
          f"max ${mx / 1e3}%6.3f  ${j.desc.take(60)}")
      }
    }
    spark.stop()
  }
}
