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
    // Local-iteration subset (same convention as Verify): the driver
    // never sets SPARK_GRAFT_ONLY, so the round artifact is always the
    // full catalog.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    // Host CPU-steal accounting (/proc/stat first line: user nice
    // system idle iowait irq softirq STEAL ...): ambient host
    // contention is the bench's dominant noise term (r8: 375 s driver
    // vs 251 s builder on identical code, with warm>cold inversions
    // matching diagnosed steal bursts) — recording the per-sample
    // steal fraction makes that drift attributable in the artifact
    // instead of costing an investigation each round.
    def cpuJiffies(): Option[(Long, Long)] =
      try {
        val line = scala.io.Source.fromFile("/proc/stat").getLines()
          .find(_.startsWith("cpu ")).get
        val f = line.trim.split("\\s+").drop(1).map(_.toLong)
        // total = user..steal (first 8 fields) only: the kernel folds
        // guest/guest_nice into user jiffies, so summing all fields
        // double-counts guest time and under-reports the steal
        // fraction on VM hosts (ADVICE r9)
        Some((f(7), f.take(8).sum)) // (steal, total)
      } catch { case _: Throwable => None }
    // In-SESSION noise accounting (VERDICT r9 #1): the steal fields
    // closed the HOST channel; the remaining unattributed spread (q74
    // in-catalog 22.7 s vs 7.6 s isolated, steal-clean) points at
    // accumulated JVM state. Record per-sample GC collection-time and
    // JIT compilation-time deltas, as fractions of the sample's wall,
    // exactly like steal — so an inflated sample names its cause in
    // the artifact instead of costing an investigation.
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime.max(0L)).sum
    def jitMillis(): Long =
      Option(java.lang.management.ManagementFactory.getCompilationMXBean)
        .filter(_.isCompilationTimeMonitoringSupported)
        .map(_.getTotalCompilationTime).getOrElse(0L)
    case class Sample(wall: Double, err: Option[String],
        steal: Option[Double], gc: Double, jit: Double)
    val results = SparkEntry.queries.toSeq
      .filter(t => only.forall(_.findFirstIn(t._1).isDefined))
      .sortBy(_._1).map { case (name, fn) =>
      def once(cold: Boolean = true): Sample = {
        // drop the query-scoped memo caches (shared chain fixtures,
        // IVF quantizer) BEFORE the clock starts: round 5's q73
        // headline was a 0.05 s memo hit on a 4.4 s cold chain — a
        // best-of-N sample must measure the query, not the cache.
        // Warm samples skip the clear: recording BOTH separates a
        // methodology change from an operator regression across
        // rounds (the r5→r6 "1.55×" was purely warm→cold).
        if (cold) SparkEntry.clearQueryCaches()
        val j0 = cpuJiffies(); val g0 = gcMillis(); val c0 = jitMillis()
        val t0 = System.nanoTime()
        // toRdd.count() materializes every output column — a plain
        // Dataset.count() would let Catalyst prune the expensive
        // projections and under-measure the query.
        val err =
          try { fn(spark, sfDir).queryExecution.toRdd.count(); None }
          catch { case e: Throwable => Some(e.toString.takeWhile(_ != '\n').take(200)) }
        val wall = (System.nanoTime() - t0) / 1e9
        val steal = for {
          (s0, tot0) <- j0; (s1, tot1) <- cpuJiffies()
          if tot1 > tot0
        } yield (s1 - s0).toDouble / (tot1 - tot0)
        // fractions of this sample's wall spent in stop-the-world GC
        // and (cumulative, cross-thread) JIT compilation; jit can
        // exceed 1.0 — several compiler threads run concurrently
        Sample(wall, err, steal,
          (gcMillis() - g0) / 1e3 / wall.max(1e-9),
          (jitMillis() - c0) / 1e3 / wall.max(1e-9))
      }
      val base = (1 to reps).map(_ => once())
      // sub-second queries are scheduling-jitter-bound (measured: every
      // >1.3x cross-run delta in round 5 was sub-second); one extra
      // sample there costs little and tightens the artifact
      val coldSamples =
        if (base.map(_.wall).min < 1.0 && base.forall(_.err.isEmpty)) base :+ once()
        else base
      // warm samples per query, after the colds (memo caches carry
      // over from the last cold run); a FAILED warm rep must not pose
      // as a fast warm number — record null and surface the error.
      // Multi-second queries get TWO warm samples and report the min,
      // the same contention filter the cold headline has: the round-7
      // "q82 warm 11.1 s vs cold 7.1 s" was one warm sample landing on
      // a host CPU-steal burst (diagnosed with a per-job listener —
      // every one of the chain's 114 jobs slowed uniformly ~4x, no
      // stage- or cache-specific cause; GC log clean) that min-of-2
      // cold absorbed and min-of-1 warm could not.
      val warmRes: Seq[Sample] =
        if (coldSamples.forall(_.err.isEmpty)) {
          val first = once(cold = false)
          if (coldSamples.map(_.wall).min >= 1.0) Seq(first, once(cold = false))
          else Seq(first)
        } else Seq.empty
      val warmOk = warmRes.collect { case Sample(t, None, _, _, _) => t }
      val warm = if (warmOk.nonEmpty) Some(warmOk.min) else None
      val err = coldSamples.collectFirst { case Sample(_, Some(e), _, _, _) => e }
        .orElse(warmRes.collectFirst {
          case Sample(_, Some(e), _, _, _) => s"warm-only: $e" })
      // the reported min is over SUCCESSFUL samples: a fast failure
      // must not under-report a query whose other rep succeeded (the
      // headline and the failure set would disagree); only when every
      // rep failed do the failed walls stand in
      val ok = coldSamples.collect { case Sample(t, None, _, _, _) => t }
      (name, coldSamples.map(_.wall),
        if (ok.nonEmpty) ok else coldSamples.map(_.wall), warm, err,
        coldSamples ++ warmRes)
    }
    def stealArr(ss: Seq[Option[Double]]): String =
      ss.map(_.map(v => f"$v%.4f").getOrElse("null")).mkString("[", ",", "]")
    def fracArr(ss: Seq[Double]): String =
      ss.map(v => f"$v%.4f").mkString("[", ",", "]")
    val qs = results.map { case (k, _, ok, _, _, _) => s"\"" + k + "\":" + ok.min }
      .mkString("{", ",", "}")
    // the structured per-query map the round artifacts consume:
    // name → {cold (best-of-N, caches cleared), warm (one post-cold
    // sample, caches kept), samples (raw cold walls), steal/gc/jit
    // (per-sample fractions of wall, cold samples then warm samples)}
    val parsed = results.map { case (k, ss, ok, warm, _, samples) =>
      s"\"" + k + "\":{\"cold\":" + ok.min +
        ",\"warm\":" + warm.map(_.toString).getOrElse("null") +
        ",\"samples\":" + ss.mkString("[", ",", "]") +
        ",\"steal\":" + stealArr(samples.map(_.steal)) +
        ",\"gc\":" + fracArr(samples.map(_.gc)) +
        ",\"jit\":" + fracArr(samples.map(_.jit)) + "}" }
      .mkString("{", ",", "}")
    val failures = results.collect { case (k, _, _, _, Some(e), _) =>
      "\"" + k + "\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._3.min).sum
    // samples whose steal fraction exceeds the flag threshold: these
    // walls are ambient-contended, not the query's own cost
    val stealThreshold = 0.05
    val highSteal = results.collect {
      case (k, _, _, _, _, samples)
        if samples.flatMap(_.steal).exists(_ > stealThreshold) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // samples dominated by stop-the-world GC (same flag convention):
    // these walls are JVM-debt-contended, not the query's own cost
    val gcThreshold = 0.20
    val highGc = results.collect {
      case (k, _, _, _, _, samples)
        if samples.exists(_.gc > gcThreshold) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$qs,"parsed":$parsed,"failures":$failures,"high_steal":$highSteal,"steal_threshold":$stealThreshold,"high_gc":$highGc,"gc_threshold":$gcThreshold,"sf":"$sfDir"}"""
    println(json)
    // Persist the full artifact: captured stdout tails truncate to the
    // last ~2000 chars, which can never hold the 105-query map — the
    // FILE is the structured record (driver cwd, judge-readable).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    // Final stdout line: a COMPACT summary sized to fit whole inside a
    // 2000-char tail window (total, failure names, 5 slowest colds),
    // so a truncated capture still parses structurally.
    val slow = results.sortBy(-_._3.min).take(5)
      .map { case (k, _, ok, warm, _, _) => s"\"" + k + "\":{\"cold\":" +
        f"${ok.min}%.2f" + ",\"warm\":" +
        warm.map(w => f"$w%.2f").getOrElse("null") + "}" }
      .mkString("{", ",", "}")
    val failNames = results.collect { case (k, _, _, _, Some(_), _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    println(s"""{"bench_summary":{"total":$total,"n_queries":${results.size},""" +
      s""""reps":$reps,"failed":$failNames,"high_steal":$highSteal,""" +
      s""""high_gc":$highGc,""" +
      s""""slowest":$slow,"detail":"$outPath"}}""")
    spark.stop()
  }
}
