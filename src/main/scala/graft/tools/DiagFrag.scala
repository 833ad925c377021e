package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch component-level profiler for the text-curation chain
  * (round 17): times isolated fragments with the noop sink so the
  * hot stage names itself. Not part of the driver contract. */
object DiagFrag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.model.SessionTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextFunctions._
    import graft.operators.TextDedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(name: String, reps: Int = 3)(f: => DataFrame): Unit = {
      val walls = (1 to reps).map { _ =>
        graft.SparkEntry.clearQueryCaches()
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[frag] $name%-34s " + walls.map(w => f"$w%6.2f").mkString(" "))
    }
    // session job/task floor: trivial no-shuffle and one-shuffle jobs
    locally {
      def floor(name: String, n: Int)(f: => Unit): Unit = {
        f // warm
        val t0 = System.nanoTime(); (1 to n).foreach(_ => f)
        println(f"[frag] $name%-34s ${(System.nanoTime() - t0) / 1e6 / n}%8.1f ms/job")
      }
      val preRdd = spark.range(1000).coalesce(1).queryExecution.toRdd
      floor("floor_sched_only_1task", 20)(preRdd.count())
      val preRdd32 = spark.range(32000).queryExecution.toRdd
      floor("floor_sched_only_32task", 20)(preRdd32.count())
      floor("floor_noshuffle_1task", 20)(spark.range(1000).coalesce(1).count())
      floor("floor_noshuffle_32task", 20)(spark.range(32000).count())
      floor("floor_shuffle32", 10)(
        spark.range(100000).repartition(32).count())
      floor("floor_groupby_shuffle", 10)(
        spark.range(100000).selectExpr("id % 1000 as k").groupBy("k").count()
          .write.format("noop").mode("overwrite").save())
    }
    time("scan_count")(docs.select(col("doc_id")))
    time("tokens_size")(docs.select(size(tokens(col("text"))).as("n")))
    time("langid")(docs.select(langId(tokens(col("text"))).as("l")))
    time("quality")(docs.select(qualityScore(col("text")).as("q")))
    time("lang+quality+wc+bpe")(docs
      .select(langId(tokens(col("text"))).as("l"), qualityScore(col("text")).as("q"),
        wsTokenCount(col("text")).as("w"), bpeishTokenCount(col("text")).as("b")))
    time("fingerprint")(docs.select(fingerprint(col("text")).as("f")))
    time("exactDedup")(TextDedup.exactDedup(docs))
    time("shingleRows_w3")(TextDedup.shingleRows(docs, 3))
    time("sh+cap100k")(TextDedup.capShingleDf(TextDedup.shingleRows(docs, 3), 100000L))
    time("minhashPairs_md5_j.5")(TextDedup.minhashLshPairs(docs, k = 8, bands = 4,
      shingleWidth = 3, minJaccard = 0.5, md5Hashes = true, dfCap = 100000L))
    // decomposition of the pairs machinery (shRows persisted as in the
    // operator, so each stage pays its own cost, not its upstream's)
    def shPersisted(): DataFrame = {
      val sh = TextDedup.capShingleDf(TextDedup.shingleRows(docs, 3), 100000L)
      graft.model.RelCache.hold("diag.sh", sh)
      sh.count()
      sh
    }
    time("bands_from_cached_sh") { val sh = shPersisted()
      TextDedup.bandRows(sh, 8, 4, true, "doc_id") }
    time("cand_from_cached_sh") { val sh = shPersisted()
      val banded = TextDedup.bandRows(sh, 8, 4, true, "doc_id")
      banded.select(col("band"), col("doc_id").as("id_a"))
        .join(banded.select(col("band"), col("doc_id").as("id_b")), Seq("band"))
        .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct() }
    time("inter_from_cached") { val sh = shPersisted()
      val banded = TextDedup.bandRows(sh, 8, 4, true, "doc_id")
      val cand = banded.select(col("band"), col("doc_id").as("id_a"))
        .join(banded.select(col("band"), col("doc_id").as("id_b")), Seq("band"))
        .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
      graft.model.RelCache.hold("diag.cand", cand); cand.count()
      cand.join(sh.select(col("doc_id").as("id_a"), col("s")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("s")), Seq("id_b", "s"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter")) }
    time("q65_full")(graft.SparkEntry.queries("q65_text_curation")(spark, sfDir))
    spark.stop()
  }
}
