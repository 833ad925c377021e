package graft

import graft.operators.TextDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-17 rewrite gates: the zero-shuffle shingle/gram/winnow
  * derivations (regex-lookahead shingle arrays + array-level window
  * minima) must equal the round-16 posexplode + doc-keyed-window
  * formulations row for row. The old formulations are re-implemented
  * here as the reference; fixtures cover the edge shapes the rewrite
  * had to preserve (empty/whitespace-only text, fewer tokens than the
  * width, exactly the width, duplicate shingles, duplicate selected
  * winnow hashes, multi-doc ties). */
class ShingleRewriteSpec extends SparkSpec {
  import graft.functions.TextFunctions.tokens

  private lazy val docs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact twin
      (3L, "one two"),                                     // shorter than w=3
      (4L, "solo"),                                        // single token
      (5L, ""),                                            // empty
      (6L, "  ...  "),                                     // no tokens after normalize
      (7L, "a b a b a b a b"),                             // heavy duplicate grams
      (8L, "Punct, splits; and CASE folds THE quick brown fox")
    ).toDF("doc_id", "text")
  }

  /** The round-16 shingleRows: posexplode + lead windows. */
  private def shingleRowsOld(d: DataFrame, w: Int): DataFrame = {
    val tok = d.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tk")))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val leads = (1 until w).map(o => lead(col("tk"), o).over(wDoc))
    val full = if (leads.isEmpty) lit(true) else leads.last.isNotNull
    tok.withColumn("s", concat_ws(" ", (col("tk") +: leads): _*))
      .withColumn("full", full)
      .filter(col("full") || col("pos") === 0)
      .select(col("doc_id"), col("s")).distinct()
  }

  /** The round-16 winnowFingerprints: lead windows + sliding min. */
  private def winnowOld(d: DataFrame, k: Int, window: Int,
      md5Hashes: Boolean): DataFrame = {
    val tok = d.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tk")))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val leads = (1 until k).map(o => lead(col("tk"), o).over(wDoc))
    val full = if (leads.isEmpty) lit(true) else leads.last.isNotNull
    val gram = concat_ws(" ", (col("tk") +: leads): _*)
    val hCol = if (md5Hashes) md5(gram) else xxhash64(gram)
    val grams = tok.withColumn("h", hCol).withColumn("full", full)
      .filter(col("full") || col("pos") === 0)
      .select(col("doc_id"), col("pos"), col("h"))
    grams
      .withColumn("ng", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("sel", min(struct(col("h"), (-col("pos")).as("np")))
        .over(wDoc.rowsBetween(Window.currentRow, window - 1)))
      .filter(col("pos") <= col("ng") - window || col("pos") === 0)
      .select(col("doc_id"), (-col("sel.np")).cast("int").as("pos"),
        col("sel.h").as("h"))
      .distinct()
  }

  private def rows(d: DataFrame): Set[String] =
    d.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  for (w <- Seq(1, 2, 3, 5)) {
    test(s"shingleRows rewrite ≡ posexplode+lead formulation (w=$w)") {
      assert(rows(TextDedup.shingleRows(docs, w)) === rows(shingleRowsOld(docs, w)))
    }
  }

  test("shingleRows keeps extras columns") {
    val withSrc = docs.withColumn("src", concat(lit("s"), col("doc_id") % 2))
    val got = TextDedup.shingleRows(withSrc, 3, extras = Seq("src"))
    assert(got.columns.toSeq === Seq("doc_id", "src", "s"))
    // same (doc, s) set as the plain form; src is functional on doc_id
    assert(rows(got.select("doc_id", "s")) === rows(shingleRowsOld(docs, 3)))
  }

  for ((k, win) <- Seq((4, 4), (1, 2), (3, 1), (2, 6))) {
    for (md5H <- Seq(true, false)) {
      test(s"winnowFingerprints rewrite ≡ window formulation (k=$k window=$win md5=$md5H)") {
        assert(rows(TextDedup.winnowFingerprints(docs, k, win, md5H)) ===
          rows(winnowOld(docs, k, win, md5H)))
      }
    }
  }

  test("minhashLshPairs carries exact sizes (vs direct per-pair Jaccard)") {
    // the sizes now ride the signature aggregation; re-derive the pair
    // Jaccards from first principles over the shingle relation
    val pairs = TextDedup.minhashLshPairs(docs, k = 8, bands = 4,
      shingleWidth = 3, minJaccard = 0.0, md5Hashes = true).collect()
    val sh = TextDedup.shingleRows(docs, 3).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (sa, sb) = (sh(a), sh(b))
      val expect = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(j - expect) < 1e-12, s"pair ($a,$b)")
    }
  }

  test("minJaccard > 0 path ≡ thresholding the minJaccard = 0 relation") {
    val all = TextDedup.minhashLshPairs(docs, k = 8, bands = 4,
      shingleWidth = 3, minJaccard = 0.0, md5Hashes = true)
      .filter(col("jaccard") >= 0.5)
    val thresholded = TextDedup.minhashLshPairs(docs, k = 8, bands = 4,
      shingleWidth = 3, minJaccard = 0.5, md5Hashes = true)
    assert(rows(all) === rows(thresholded))
  }
}
