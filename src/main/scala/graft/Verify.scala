package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.model.SessionTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // intentional post-materialization unpersists of locally-
    // checkpointed round state (TextDedup.duplicateComponents) log an
    // unconditional WARN per release — deny ONLY that message (ADVICE
    // r15: the old whole-logger demotion also masked "block not
    // found" warnings, Verify's first symptom of a bad releaseState)
    graft.model.LogHygiene.suppressIntentionalUnpersistWarn()
    new java.io.File(outDir).mkdirs()
    // Queries run on a small thread pool — Spark schedules concurrent
    // jobs, so independent query dumps overlap their stages and the
    // wall time drops ~3x vs sequential.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    // Local-iteration subset: SPARK_GRAFT_ONLY=<regex> restricts the
    // dump (and the oracle json) to matching query names. The driver
    // never sets it, so the gate always runs the full catalog.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    def keep(name: String): Boolean =
      only.forall(_.findFirstIn(name).isDefined)
    val tasks = SparkEntry.queries.toSeq.filter(t => keep(t._1))
      .sortBy(_._1).map { case (name, fn) =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          // Normalize IEEE negative zero (+ 0.0 ⇒ +0.0) on every double
          // column: engines disagree on the sign of rounded -0.0 and the
          // driver's hash compare is bit-sensitive.
          import org.apache.spark.sql.functions.{col, lit}
          import org.apache.spark.sql.types.DoubleType
          try {
            val df = fn(spark, sfDir)
            val fixed = df.select(df.schema.fields.map { f =>
              if (f.dataType == DoubleType) (col(f.name) + lit(0.0)).as(f.name)
              else col(f.name)
            }.toSeq: _*)
            fixed.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          }
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    // q142 gate armor (VERDICT r10 #1): snapshot the at-rest winnow
    // index (counts + order-insensitive checksums) next to the dumps,
    // so a repeat of the r10 driver flake is self-explaining — the
    // diag separates "the index differed" from "the compare flaked".
    if (keep("q142_containment_incremental")) {
      try Files.writeString(Paths.get(s"$outDir/q142_diag.json"),
        graft.queries.TextQueries.q142Diag(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[verify] q142 diag failed: ${e.getMessage}") }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(t => keep(t._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
