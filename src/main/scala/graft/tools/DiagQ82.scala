package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** One-off diagnosis harness for bench-sample variance: run one
  * catalog query N times in a single JVM, recording per-Spark-job
  * wall times, and print the slowest jobs of each rep so the stage
  * that blows up is visible. Not part of the driver contract. */
object DiagQ82 {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q82_e2_blocked"
    val reps = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = graft.model.SessionTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    // A/B harness for session-level conf candidates:
    //   SPARK_GRAFT_DIAG_CONF="k=v;k2=v2" applies before getOrCreate
    val spark = sys.env.get("SPARK_GRAFT_DIAG_CONF").filter(_.nonEmpty)
      .map(_.split(";").foldLeft(b0) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v) })
      .getOrElse(b0)
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_DIAG_LOGLEVEL", "WARN"))
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    // per-stage detail: (name@callsite, wall, task-time sum, shuffle
    // read/write bytes) — names the pressure point, not just the job
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(),
          Option(j.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val st = jobs.remove(j.jobId)
        if (st != null) done.add((j.jobId, System.nanoTime() - st._1, st._2))
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b).getOrElse(0L)
        stages.add((s"tasks=${i.numTasks} ${i.name}", wall, i.taskMetrics.executorRunTime,
          i.taskMetrics.shuffleReadMetrics.totalBytesRead,
          i.taskMetrics.shuffleWriteMetrics.bytesWritten))
      }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { rep =>
      graft.SparkEntry.clearQueryCaches()
      done.clear(); stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      // give listener events a moment to drain
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val all = done.asScala.toSeq.sortBy(-_._2)
      val total = all.map(_._2).sum / 1e9
      println(f"[diag] rep $rep wall=$wall%.2f s jobs=${all.size} jobSum=$total%.2f s")
      all.take(8).foreach { case (id, ns, desc) =>
        println(f"[diag]   job $id%4d ${ns / 1e9}%7.2f s  ${desc.take(90)}")
      }
      val allSt = stages.asScala.toSeq
      println(f"[diag]   stages=${allSt.size} taskSum=${allSt.map(_._3).sum / 1e3}%.1f s " +
        f"stageWallSum=${allSt.map(_._2).sum / 1e3}%.1f s " +
        f"nTasks=${allSt.map(_._1.split(" ")(0).drop(6).toInt).sum}")
      val st = stages.asScala.toSeq.sortBy(-_._3).take(10)
      st.foreach { case (nm, wall, task, rd, wr) =>
        println(f"[diag]   stage wall=${wall / 1e3}%7.2f s task=${task / 1e3}%8.1f s " +
          f"shufR=${rd / 1e6}%8.1f MB shufW=${wr / 1e6}%8.1f MB  ${nm.take(100)}")
      }
    }
    spark.stop()
  }
}
