package graft

import java.sql.Timestamp
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{Event, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamOpsSpec extends SparkSpec {

  test("streaming sessionize closes a session after the gap timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val sessions = StreamOps.sessionize(input.toDS(), gapMinutes = 30)
    val query = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      input.addData(
        Event(1L, 1L, new Timestamp(t0), "click", 1.0),
        Event(1L, 2L, new Timestamp(t0 + 60000), "click", 2.0),
        Event(2L, 3L, new Timestamp(t0), "view", 5.0))
      query.processAllAvailable()
      // push watermark past the session gap: a much later event
      input.addData(Event(9L, 99L, new Timestamp(t0 + 3 * 3600 * 1000L), "click", 0.0))
      query.processAllAvailable()
      val out = spark.table("sessions_out").as[SessionOut].collect()
      val u1 = out.find(_.user_id == 1L)
      assert(u1.isDefined, s"expected a closed session for user 1, got ${out.toSeq}")
      assert(u1.get.n_events == 2 && u1.get.sum_value == 3.0)
      assert(out.exists(_.user_id == 2L))
    } finally query.stop()
  }

  test("parquet file sink with checkpointing persists windowed aggregates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val input = MemoryStream[Event]
    val counts = StreamOps.windowedCounts(
      input.toDS().select(col("ts"), col("event_type"), col("value")))
    val query = StreamOps.parquetSink(counts, s"$dir/out", s"$dir/ckpt")
    try {
      val t0 = 1700000000000L
      input.addData(
        Event(1L, 1L, new Timestamp(t0), "click", 1.0),
        Event(1L, 2L, new Timestamp(t0 + 60000), "click", 2.0))
      query.processAllAvailable()
      // advance the watermark so the first window finalizes and flushes
      input.addData(Event(2L, 3L, new Timestamp(t0 + 5 * 3600 * 1000L), "view", 1.0))
      query.processAllAvailable()
      val out = spark.read.parquet(s"$dir/out")
      assert(out.count() >= 1)
      val clicks = out.filter(col("event_type") === "click").collect()
      assert(clicks.length == 1 && clicks.head.getAs[Long]("n") == 2L)
      // checkpoint directory materialized (offsets + commits WAL)
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/ckpt/offsets")))
    } finally query.stop()
  }

  test("streamingDedup keeps one document per fingerprint within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = StreamOps.streamingDedup(
      input.toDS().toDF("ts", "doc_id", "text"))
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      input.addData(
        (new Timestamp(t0), 1L, "the quick brown fox"),
        (new Timestamp(t0 + 1000), 2L, "The  quick   brown FOX"), // same normalised stream
        (new Timestamp(t0 + 2000), 3L, "a different document"))
      query.processAllAvailable()
      // duplicate arriving in a later batch, still inside the watermark
      input.addData((new Timestamp(t0 + 3000), 4L, "the quick brown fox"))
      query.processAllAvailable()
      val out = spark.table("dedup_out").select("doc_id").as[Long].collect().sorted
      assert(out.toSeq == Seq(1L, 3L),
        s"expected first-per-fingerprint docs 1 and 3, got ${out.toSeq}")
    } finally query.stop()
  }

  test("streamingNearDup suppresses signature-identical near-duplicates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = StreamOps.streamingNearDup(
      input.toDS().toDF("ts", "doc_id", "text"), k = 4)
    val query = deduped.writeStream.format("memory")
      .queryName("neardup_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      input.addData(
        (new Timestamp(t0), 1L, base),
        // identical token stream, different punctuation/case: same
        // shingle set, same signature
        (new Timestamp(t0 + 1000), 2L, base.toUpperCase + "."),
        (new Timestamp(t0 + 2000), 3L, "a completely different document body"))
      query.processAllAvailable()
      val out = spark.table("neardup_out").select("doc_id").as[Long].collect().sorted
      assert(out.toSeq == Seq(1L, 3L),
        s"expected signature-dedup to keep 1 and 3, got ${out.toSeq}")
    } finally query.stop()
  }

  test("streamingCuration: exact + signature dedup, lang/quality filter, scrub, tokens") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long, String)]
    val curated = StreamOps.streamingCuration(
      input.toDS().toDF("ts", "doc_id", "text"),
      minQuality = 0.0, k = 4, scrubPii = true)
    val query = curated.writeStream.format("memory")
      .queryName("curation_out").outputMode("append").start()
    try {
      val t0 = 1700000000000L
      val base = "the contact for this document is alice at alice@example.com thanks"
      input.addData(
        (new Timestamp(t0), 1L, base),
        (new Timestamp(t0 + 1000), 2L, base),                       // exact dup
        (new Timestamp(t0 + 2000), 3L, base.toUpperCase + "!!"),    // signature dup
        (new Timestamp(t0 + 3000), 4L, "ein komplett anderes deutsches dokument und noch mehr worte dazu"),
        (new Timestamp(t0 + 4000), 5L, "another english document with plenty of distinct words in it"))
      query.processAllAvailable()
      val out = spark.table("curation_out")
      val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
      // 2 = exact dup, 3 = signature dup, 4 = non-English
      assert(ids == Seq(1L, 5L), s"expected curated docs 1 and 5, got $ids")
      val row1 = out.filter(col("doc_id") === 1L).collect().head
      assert(!row1.getAs[String]("text").contains("alice@example.com"),
        "PII scrub must run before token stats")
      assert(row1.getAs[Int]("ws_tokens") > 0 && row1.getAs[String]("lang") == "en")
    } finally query.stop()
  }

  test("readRsemResults maps symbols to Ensembl ids and drops unmapped rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rsem").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/s1.results"),
      ("gene_id\texpected_count\tTPM\n" +
       "TP53|7157\t120.5\t8.1\n" +
       "BRCA1|672\t33.0\t1.2\n" +
       "UNKNOWN|0\t5.0\t0.1\n").getBytes)
    val geneInfo = Seq(("ENSG00000141510", "TP53"), ("ENSG00000012048", "BRCA1"))
      .toDF("ensembl_id", "symbol")
    val out = graft.sources.MatrixIO.readRsemResults(spark, s"$dir/s1.results", "s1", geneInfo)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("ENSG00000141510" -> 120.5, "ENSG00000012048" -> 33.0))
  }

  test("windowedCounts groups into tumbling windows (batch mode)") {
    import spark.implicits._
    val t0 = 1700000000000L // 2023-11-14 22:13:20 UTC
    val df = Seq(
      (new Timestamp(t0), "a", 1.0),
      (new Timestamp(t0 + 10 * 60 * 1000), "a", 2.0),
      (new Timestamp(t0 + 65 * 60 * 1000), "a", 4.0))
      .toDF("ts", "event_type", "value")
    // batch path: same groupBy(window) expression works without a stream
    val out = df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .collect()
    assert(out.map(_.getAs[Long]("n")).sorted.toSeq == Seq(1L, 2L))
  }
}
