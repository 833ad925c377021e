package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Each query is timed `reps` times and the BEST is reported (the
    // ScaleProbe convention): a single-sample bench let one burst of
    // machine contention forge a >2× "regression" on unchanged code in
    // round 4 (19 phantom slowdowns, none reproducible). The minimum of
    // two runs only lies if BOTH samples were contended; raw samples
    // are emitted alongside so any contention is visible in the
    // artifact itself.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, JIT, parquet footers) so per-query
    // numbers measure the queries, not JVM startup.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("lineitem", "documents", "embeddings", "events")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): (Double, Option[String]) = {
        // drop the query-scoped memo caches (shared chain fixtures,
        // IVF quantizer) BEFORE the clock starts: round 5's q73
        // headline was a 0.05 s memo hit on a 4.4 s cold chain — a
        // best-of-N sample must measure the query, not the cache
        SparkEntry.clearQueryCaches()
        val t0 = System.nanoTime()
        // toRdd.count() materializes every output column — a plain
        // Dataset.count() would let Catalyst prune the expensive
        // projections and under-measure the query.
        val err =
          try { fn(spark, sfDir).queryExecution.toRdd.count(); None }
          catch { case e: Throwable => Some(e.toString.takeWhile(_ != '\n').take(200)) }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val base = (1 to reps).map(_ => once())
      // sub-second queries are scheduling-jitter-bound (measured: every
      // >1.3x cross-run delta in round 5 was sub-second); one extra
      // sample there costs little and tightens the artifact
      val samples =
        if (base.map(_._1).min < 1.0 && base.forall(_._2.isEmpty)) base :+ once()
        else base
      val err = samples.collectFirst { case (_, Some(e)) => e }
      // the reported min is over SUCCESSFUL samples: a fast failure
      // must not under-report a query whose other rep succeeded (the
      // headline and the failure set would disagree); only when every
      // rep failed do the failed walls stand in
      val ok = samples.collect { case (t, None) => t }
      (name, samples.map(_._1), if (ok.nonEmpty) ok else samples.map(_._1), err)
    }
    val qs = results.map { case (k, _, ok, _) => s"\"" + k + "\":" + ok.min }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, ss, _, _) =>
      s"\"" + k + "\":" + ss.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val failures = results.collect { case (k, _, _, Some(e)) =>
      "\"" + k + "\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._3.min).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$qs,"samples":$raw,"failures":$failures,"sf":"$sfDir"}"""
    println(json)
    // Also persist to a file: captured stdout tails get truncated and
    // drop the head of the per-query map.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
