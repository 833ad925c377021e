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
    // Per-sample JOB/STAGE listener (VERDICT r10 #2): the steal and
    // gc/jit fields closed the host and JVM-debt channels but left
    // 2-4x sample outliers unattributed — this snapshot records what
    // the TASKS did during each sample (executor run/cpu time, task
    // GC, shuffle volume, spill), so an inflated wall names its cause
    // in the artifact: task_sec scaling with wall = uniform slowdown
    // (ambient contention); flat task_sec with inflated wall =
    // scheduler idle/straggler; cpu_frac collapse = cpu-wait.
    class TaskMeter extends org.apache.spark.scheduler.SparkListener {
      var jobs = 0L; var tasks = 0L; var runMs = 0L; var cpuNs = 0L
      var gcMs = 0L; var shufB = 0L; var spillB = 0L
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        synchronized {
          tasks += 1
          val m = t.taskMetrics
          if (m != null) {
            runMs += m.executorRunTime; cpuNs += m.executorCpuTime
            gcMs += m.jvmGCTime
            shufB += m.shuffleReadMetrics.totalBytesRead
            spillB += m.diskBytesSpilled
          }
        }
      def reset(): Unit = synchronized {
        jobs = 0; tasks = 0; runMs = 0; cpuNs = 0; gcMs = 0; shufB = 0
        spillB = 0
      }
      // quiescence probe for the post-sample bus drain: the pair of
      // monotone counters that move on every late-arriving event
      def counts(): (Long, Long) = synchronized { (jobs, tasks) }
      def snap(): Tasks = synchronized {
        Tasks(jobs, tasks, runMs / 1e3,
          if (runMs > 0) cpuNs / 1e6 / runMs else 0.0,
          if (runMs > 0) gcMs.toDouble / runMs else 0.0,
          shufB / 1e6, spillB / 1e6)
      }
    }
    case class Tasks(jobs: Long, tasks: Long, taskSec: Double,
        cpuFrac: Double, taskGcFrac: Double, shufMb: Double, spillMb: Double)
    val meter = new TaskMeter
    spark.sparkContext.addSparkListener(meter)
    // Post-sample listener-bus drain (ADVICE r11): poll until the
    // meter's job/task counters are quiescent (two consecutive
    // identical reads), bounded at 2 s so a wedged bus can't hang the
    // bench. A fixed 50 ms sleep raced multi-second, 100+-job samples
    // and could bleed task events across samples — exactly the signal
    // the outlier 'cause' discriminator keys on.
    def drainMeter(): Unit = {
      var lastCounts = (-1L, -1L)
      var settled = 0
      val drainDeadline = System.nanoTime() + 2_000_000_000L
      while (settled < 2 && System.nanoTime() < drainDeadline) {
        Thread.sleep(20)
        val now = meter.counts()
        if (now == lastCounts) settled += 1 else { settled = 0; lastCounts = now }
      }
    }
    case class Sample(wall: Double, err: Option[String],
        steal: Option[Double], gc: Double, jit: Double, t: Tasks,
        buildSec: Double)
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
        meter.reset()
        val b0 = graft.model.BuildMeter.seconds
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
        // listener events are async — drain the bus to quiescence
        // before snapshotting (ADVICE r11: a fixed 50 ms sleep raced
        // multi-second samples)
        drainMeter()
        // fractions of this sample's wall spent in stop-the-world GC
        // and (cumulative, cross-thread) JIT compilation; jit can
        // exceed 1.0 — several compiler threads run concurrently
        Sample(wall, err, steal,
          (gcMillis() - g0) / 1e3 / wall.max(1e-9),
          (jitMillis() - c0) / 1e3 / wall.max(1e-9), meter.snap(),
          graft.model.BuildMeter.seconds - b0)
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
      // EVERY query gets TWO warm samples and reports the min — the
      // same contention filter the cold headline has (the round-7
      // "q82 warm 11.1 s vs cold 7.1 s" was one warm sample on a host
      // steal burst). Sub-second queries used to get min-of-1, which
      // let a single burst become the warm headline (r10's q137 warm
      // 6.79 s vs cold 0.83 s was exactly that); their second sample
      // costs under a second, so min-of-2 is now unconditional
      // (VERDICT r10 #2).
      val warmRes: Seq[Sample] =
        if (coldSamples.forall(_.err.isEmpty))
          Seq(once(cold = false), once(cold = false))
        else Seq.empty
      val warmOk = warmRes.collect { case Sample(t, None, _, _, _, _, _) => t }
      val warm = if (warmOk.nonEmpty) Some(warmOk.min) else None
      val err = coldSamples.collectFirst { case Sample(_, Some(e), _, _, _, _, _) => e }
        .orElse(warmRes.collectFirst {
          case Sample(_, Some(e), _, _, _, _, _) => s"warm-only: $e" })
      // the reported min is over SUCCESSFUL samples: a fast failure
      // must not under-report a query whose other rep succeeded (the
      // headline and the failure set would disagree); only when every
      // rep failed do the failed walls stand in
      val ok = coldSamples.collect { case Sample(t, None, _, _, _, _, _) => t }
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
        ",\"jit\":" + fracArr(samples.map(_.jit)) +
        ",\"task_sec\":" + fracArr(samples.map(_.t.taskSec)) +
        ",\"cpu_frac\":" + fracArr(samples.map(_.t.cpuFrac)) + "}" }
      .mkString("{", ",", "}")
    // OUTLIER ATTRIBUTION (VERDICT r10 #2): any sample whose wall
    // exceeds 1.5x the best same-kind (cold/warm) sibling gets a
    // NAMED cause from its task snapshot — the r7 q82 diagnosis
    // pattern, automated. The discriminator: task_sec scaling with
    // wall = the tasks themselves ran long (ambient contention /
    // cpu-wait, visible in cpu_frac); flat task_sec with inflated
    // wall = the executor sat idle (scheduler gaps / stragglers).
    val stealThr = 0.05
    def cause(s: Sample, best: Sample, firstCold: Boolean): String = {
      val wallR = s.wall / best.wall.max(1e-9)
      val taskR = s.t.taskSec / best.t.taskSec.max(1e-9)
      // measured at-rest artifact builds (BuildMeter deltas) explain
      // the excess wall directly — the sharpest attribution available
      if (s.buildSec > 0.5 * (s.wall - best.wall).max(1e-9))
        f"at-rest-build: ${s.buildSec}%.2f s of this sample built warehouse artifacts (one-time, amortized by min-of-N)"
      // the first cold sample legitimately does MORE work than its
      // siblings: codegen/JIT, parquet footer reads, memo-cache and
      // at-rest index builds — when its tasks genuinely ran longer,
      // name that rather than mislabel it contention
      else if (firstCold && taskR > 1.5)
        "first-sample-build: extra task work (memo builds, codegen) the later samples amortize"
      else if (s.steal.exists(_ > stealThr)) "host-steal"
      else if (s.gc > 0.20) "driver-gc"
      else if (s.t.taskGcFrac > 0.20) "task-gc"
      else if (s.t.spillMb > 2 * best.t.spillMb + 8) "spill"
      else if (taskR > 0.75 * wallR)
        if (best.t.cpuFrac > 0 && s.t.cpuFrac < 0.6 * best.t.cpuFrac)
          "cpu-wait: tasks ran longer at collapsed cpu fraction (unaccounted external contention)"
        else "uniform-task-slowdown: task time scaled with wall at similar cpu fraction"
      else "scheduler-idle: wall inflated while task time stayed flat (stragglers/driver gaps)"
    }
    val outliers = results.flatMap { case (k, ss, _, _, _, samples) =>
      val (colds, warms) = samples.splitAt(ss.length)
      // cold samples compare within their kind; WARM samples compare
      // against the best of ALL samples — a warm run holds every cache
      // a cold run holds, so warm >> cold-best is an inversion that
      // must carry a cause, not just warm-vs-warm spread
      def flag(kind: String, grp: Seq[Sample], ref: Seq[Sample]): Seq[String] = {
        val okRef = ref.filter(_.err.isEmpty)
        if (okRef.isEmpty) Seq.empty else {
          val best = okRef.minBy(_.wall)
          grp.zipWithIndex.filter { case (s, _) => s.err.isEmpty &&
              s.wall > 1.5 * best.wall && s.wall >= 1.0 && !(s eq best) }
            .map { case (s, i) =>
            s"""{"kind":"$kind","wall":${f"${s.wall}%.2f"},"best":${f"${best.wall}%.2f"},""" +
              s""""task_sec":${f"${s.t.taskSec}%.2f"},"best_task_sec":${f"${best.t.taskSec}%.2f"},""" +
              s""""cpu_frac":${f"${s.t.cpuFrac}%.3f"},"best_cpu_frac":${f"${best.t.cpuFrac}%.3f"},""" +
              s""""jobs":${s.t.jobs},"spill_mb":${f"${s.t.spillMb}%.1f"},""" +
              s""""cause":"${cause(s, best, kind == "cold" && i == 0)}"}"""
          }
        }
      }
      val fl = flag("cold", colds, colds) ++ flag("warm", warms, colds ++ warms)
      if (fl.isEmpty) None
      else Some("\"" + k + "\":" + fl.mkString("[", ",", "]"))
    }.mkString("{", ",", "}")
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
    // SESSION-2 at-rest proof (VERDICT r10 #3, reworked per ADVICE
    // r11 + VERDICT r11 #2): the amortized family's warehouse
    // artifacts survive the session via build-complete markers. A
    // plain newSession() SHARES the external catalog, so the old
    // measurement never left the registered path — to reach the
    // driver-restart shape for real, the at-rest catalog entries are
    // first DETACHED (files + markers untouched), so the first
    // session-2 sample pays marker re-registration (regs > 0,
    // build_sec 0 — a nonzero build_sec would mean a REBUILD and
    // falsify the at-rest claim). Two samples per query, each with
    // the same task-metrics/BuildMeter attribution as the main
    // samples, so a session-2 outlier names its cause in the
    // artifact instead of sitting unexplained (q141's 31.4 s in r11).
    val s2Names = Seq("q128_neardup_amortized", "q141_quality_cluster_amortized",
        "q150_graph_amortized")
      .filter(n => SparkEntry.queries.contains(n) &&
        only.forall(_.findFirstIn(n).isDefined))
    val session2 = if (s2Names.isEmpty) "{}" else {
      val detached = graft.model.AtRest.detachGraftTables(spark)
      val s2 = spark.newSession()
      org.apache.spark.sql.SparkSession.setActiveSession(s2)
      // memo caches hold session-1-bound DataFrames; clear under the
      // ACTIVE new session so the sweep hits the right catalog
      SparkEntry.clearQueryCaches()
      val timed = s2Names.map { n =>
        // reference point for the cause discriminator: the query's
        // best MAIN sample (cold or warm) — a session-2 number that
        // dwarfs it must name its mechanism in the artifact (VERDICT
        // r11 #2: q141's 31.4 s session-2 sat unexplained)
        val mainBest = results.find(_._1 == n)
          .map(_._6.filter(_.err.isEmpty)).filter(_.nonEmpty)
          .map(_.minBy(_.wall))
        def s2once(): String = {
          meter.reset()
          val b0 = graft.model.BuildMeter.seconds
          val r0 = graft.model.BuildMeter.regCount
          val j0 = cpuJiffies(); val g0 = gcMillis(); val c0 = jitMillis()
          val t0 = System.nanoTime()
          try {
            SparkEntry.queries(n)(s2, sfDir).queryExecution.toRdd.count()
            val wall = (System.nanoTime() - t0) / 1e9
            drainMeter()
            val steal = for {
              (st0, tot0) <- j0; (st1, tot1) <- cpuJiffies()
              if tot1 > tot0
            } yield (st1 - st0).toDouble / (tot1 - tot0)
            val smp = Sample(wall, None, steal,
              (gcMillis() - g0) / 1e3 / wall.max(1e-9),
              (jitMillis() - c0) / 1e3 / wall.max(1e-9), meter.snap(),
              graft.model.BuildMeter.seconds - b0)
            val regsDelta = graft.model.BuildMeter.regCount - r0
            val why = mainBest.map { b =>
              if (smp.wall <= 1.3 * b.wall) "in-line-with-main-session"
              // the first post-detach run legitimately does MORE than a
              // main-session sample: marker re-registration DDL plus the
              // fresh session's first execution of the whole chain —
              // name that before reaching for the contention buckets
              else if (regsDelta > 0 && smp.wall <= 2.0 * b.wall)
                s"session2-first-run: $regsDelta marker re-registrations + fresh-session first execution"
              else cause(smp, b, firstCold = false)
            }.getOrElse("no-main-sample-reference")
            f"""{"wall":$wall%.3f,"build_sec":${smp.buildSec}%.3f,""" +
              s""""regs":${graft.model.BuildMeter.regCount - r0},""" +
              f""""task_sec":${smp.t.taskSec}%.2f,"jobs":${smp.t.jobs},""" +
              f""""cpu_frac":${smp.t.cpuFrac}%.3f,""" +
              f""""gc_frac":${smp.gc}%.3f,"jit_frac":${smp.jit}%.3f,""" +
              mainBest.map(b => f""""best_main_wall":${b.wall}%.3f,"best_main_task_sec":${b.t.taskSec}%.2f,""").getOrElse("") +
              s""""cause":"$why"}"""
          } catch { case e: Throwable =>
            "{\"err\":\"" + e.toString.takeWhile(_ != '\n').take(120)
              .replace("\\", "\\\\").replace("\"", "\\\"") + "\"}" }
        }
        "\"" + n + "\":{\"first\":" + s2once() + ",\"second\":" + s2once() + "}"
      }
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      SparkEntry.clearQueryCaches()
      (("\"detached\":" + detached) +: timed).mkString("{", ",", "}")
    }
    val json = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$qs,"parsed":$parsed,"failures":$failures,"outliers":$outliers,"session2":$session2,"high_steal":$highSteal,"steal_threshold":$stealThreshold,"high_gc":$highGc,"gc_threshold":$gcThreshold,"sf":"$sfDir"}"""
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
