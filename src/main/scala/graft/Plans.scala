package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for selected catalog
  * queries and flags plan smells (missing parquet pushdown, unexpected
  * sort-merge joins on broadcastable sides, codegen gaps). Run:
  * `sbt "runMain graft.Plans [queryName ...]"`. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q04_outlier_antijoin", "q05_semijoin_reliable",
        "q20_log2_cpm", "q26_sessionize", "q37_cosine_topk")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n========== $name ==========")
      println(plan)
      val smells = Seq(
        "no parquet filter pushdown" ->
          (plan.contains("PushedFilters: []") && plan.contains("Filter (")),
        "cartesian product" -> plan.contains("CartesianProduct"),
        "sort-merge join" -> plan.contains("SortMergeJoin"))
        .collect { case (s, true) => s }
      println(s"[audit] $name: " +
        (if (smells.isEmpty) "clean" else s"SMELLS: ${smells.mkString(", ")}"))
    }
    spark.stop()
  }
}
