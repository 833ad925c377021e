package graft

import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic (round 12, VERDICT r11 #2): name the cause of
  * q141's session-2 overhead by diffing the executed plan and timing
  * between the build session and a detached fresh-catalog session. */
object DiagS2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qseq = sys.env.getOrElse("SPARK_GRAFT_DIAG_Q", "q141_quality_cluster_amortized")
      .split(",").toSeq
    val q = qseq.last
    val spark = graft.model.SessionTuning.tuned(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional conf overrides: SPARK_GRAFT_DIAG_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_DIAG_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def run(s: SparkSession, tag: String): String = {
      // split the Bench-shaped wall into PLANNING (frame construction
      // + analysis + optimization + physical planning) and EXECUTION:
      // the bench clock covers both, so a planning-heavy query can
      // look "slow" while its tasks are fine
      SparkEntry.clearQueryCaches()
      val tp0 = System.nanoTime()
      val df = SparkEntry.queries(q)(s, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val wPlan = (System.nanoTime() - tp0) / 1e9
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val w1 = (System.nanoTime() - t0) / 1e9
      SparkEntry.clearQueryCaches()
      val tA = System.nanoTime()
      val df2 = SparkEntry.queries(q)(s, sfDir)
      val wCons = (System.nanoTime() - tA) / 1e9
      val tB = System.nanoTime()
      df2.queryExecution.assertAnalyzed()
      val wAna = (System.nanoTime() - tB) / 1e9
      val tC = System.nanoTime()
      df2.queryExecution.optimizedPlan
      val wOpt = (System.nanoTime() - tC) / 1e9
      val tD = System.nanoTime()
      df2.queryExecution.executedPlan
      val wPhy = (System.nanoTime() - tD) / 1e9
      val t1 = System.nanoTime()
      df2.queryExecution.toRdd.count()
      val w2 = (System.nanoTime() - t1) / 1e9
      println(f"[diag] $tag: plan1=$wPlan%.2fs exec1=$w1%.2fs | " +
        f"cons=$wCons%.2fs ana=$wAna%.2fs opt=$wOpt%.2fs phy=$wPhy%.2fs " +
        f"exec2=$w2%.2fs plan_hash=${plan.hashCode}")
      plan
    }
    // optional PREFIX queries (comma-separated before the target):
    // reproduce in-catalog accumulated state ahead of the target query
    qseq.init.foreach { pq =>
      SparkEntry.clearQueryCaches()
      val t0 = System.nanoTime()
      SparkEntry.queries(pq)(spark, sfDir).queryExecution.toRdd.count()
      println(f"[diag] prefix $pq: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val p1 = run(spark, "session1")
    val p1b = run(spark, "session1-again")
    val detached = graft.model.AtRest.detachGraftTables(spark)
    println(s"[diag] detached=$detached")
    val s2 = spark.newSession()
    SparkSession.setActiveSession(s2)
    val p2 = run(s2, "session2-detached")
    val p2b = run(s2, "session2-again")
    def norm(p: String): Seq[String] =
      p.linesIterator.map(_.replaceAll("#\\d+[L]?", "#x")
        .replaceAll("plan_id=\\d+", "plan_id=x")
        .replaceAll("\\[id=#?\\d+\\]", "[id=x]")).toSeq
    val a = norm(p1); val b = norm(p2)
    if (a == b) println("[diag] plans IDENTICAL (normalized)")
    else {
      println(s"[diag] plans DIFFER: s1 ${a.size} lines, s2 ${b.size} lines")
      a.zipAll(b, "<absent>", "<absent>").zipWithIndex
        .filter { case ((x, y), _) => x != y }.take(40)
        .foreach { case ((x, y), i) =>
          println(s"[diag]  line $i\n[diag]   s1: $x\n[diag]   s2: $y") }
    }
    spark.stop()
  }
}
