package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding VOCABULARY TRAINING as relational algebra —
  * the real merge loop (Sennrich et al. 2016: count adjacent symbol
  * pairs weighted by word frequency, merge the most frequent pair
  * left-to-right greedily, repeat), not a proxy. A trained subword
  * vocabulary is the front door of every training-data pipeline; the
  * engine's `bpeishTokenCount` estimates token counts, this trains
  * the actual merge table those counts would come from.
  *
  * The interesting representational problem is the MERGE APPLY step:
  * classic implementations fold left-to-right over each word's symbol
  * list (greedy non-overlapping), which looks inherently sequential.
  * It is not: matches of pair (a, b) at positions i and i+1 of the
  * same word can only overlap when a == b (match at i needs
  * sym[i+1] = b, match at i+1 needs sym[i+1] = a), and within a RUN
  * of consecutive match positions the greedy scan keeps exactly the
  * even offsets. So greedy-apply = mark matches on the ORIGINAL list
  * → gaps-and-islands over match positions per word → keep matches
  * at even offset from their island's start → drop the following
  * symbol of each kept match and rewrite the match symbol to the
  * concatenation. Every step is a window or join keyed on `word` —
  * no sequential fold, no UDF, and the DuckDB oracle replays each
  * round with the same algebra.
  *
  * Scale shape: the corpus collapses to the word-frequency relation
  * in one token-keyed aggregation (map-side combined); everything
  * after is VOCABULARY-grain (words × symbols rows — bounded by the
  * language, not the corpus). Per round: one pair-count aggregation,
  * one 1-row argmax collect (bounded driver anchor, the Lloyd
  * pattern), word-keyed windows/joins for the apply, and an eager
  * localCheckpoint to truncate lineage across rounds.
  */
object Bpe {

  /** (word, freq) from the engine tokenizer — the corpus-facing pass. */
  def wordFreqs(docs: DataFrame, text: String = "text"): DataFrame =
    docs.select(explode(tokens(col(text))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol relation: characters plus the terminal `</w>`
    * marker, as (word, freq, pos, sym) with dense 0-based pos. The
    * char split is substr-based (not split-on-empty) so the oracle's
    * `substr` replay is engine-identical. */
  private[graft] def initialSymbols(wf: DataFrame): DataFrame =
    wf.select(col("word"), col("freq"),
      posexplode(concat(
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))),
        array(lit("</w>")))).as(Seq("pos", "sym")))

  /** Train `nMerges` BPE merges over a corpus. Returns the merge
    * table (round, lhs, rhs, pair_count), round 1-based in training
    * order; ties on count break lexicographically (lhs, rhs) so the
    * result is deterministic and engine-replayable. Stops early if
    * no pair remains (every word fully merged). */
  def bpeMerges(docs: DataFrame, nMerges: Int,
      text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var s = initialSymbols(wordFreqs(docs, text)).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var round = 1
    var done = false
    while (round <= nMerges && !done) {
      val w = Window.partitionBy("word").orderBy("pos")
      val withNext = s.withColumn("nxt", lead(col("sym"), 1).over(w))
      val best = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("lhs"), col("nxt").as("rhs"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((round, a, b, c))
        // greedy-apply via the island parity rule (see object doc)
        val keep = withNext
          .filter(col("sym") === a && col("nxt") === b)
          .withColumn("mrank", row_number().over(w))
          .withColumn("island", col("pos") - col("mrank"))
          .withColumn("imin",
            min("pos").over(Window.partitionBy("word", "island")))
          .filter(((col("pos") - col("imin")) % 2) === 0)
          .select(col("word"), col("pos"))
        val dropped = s.join(
          keep.select(col("word"), (col("pos") + 1).as("pos")),
          Seq("word", "pos"), "left_anti")
        val prev = s
        s = dropped
          .join(keep.withColumn("hit", lit(true)), Seq("word", "pos"), "left")
          .withColumn("sym", when(col("hit"), lit(a + b)).otherwise(col("sym")))
          .withColumn("pos", row_number().over(
            Window.partitionBy("word").orderBy("pos")) - 1)
          .select("word", "freq", "pos", "sym")
          .localCheckpoint(true)
        // drop the superseded round's checkpoint blocks NOW — the
        // failure mode SCALING.md's orphaned-block note measured, fixed
        // locally instead of waiting for the global cold-sample sweep
        prev.unpersist(blocking = false)
        round += 1
      }
    }
    // the final state is dead once the merge table exists
    s.unpersist(blocking = false)
    merges.toSeq.toDF("round", "lhs", "rhs", "pair_count")
  }

  /** Segment words with a trained merge table (the ENCODE side):
    * applies the merges in training order to the (word, freq) symbol
    * relation and returns the final (word, pos, sym) segmentation —
    * the subword decomposition a tokenizer built on this vocabulary
    * would emit. Merge list is bounded (driver-side), application is
    * the same window algebra as training. */
  def segment(wf: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    var s = initialSymbols(wf.select(col("word"), lit(1L).as("freq")))
      .localCheckpoint(true)
    merges.foreach { case (a, b) =>
      val w = Window.partitionBy("word").orderBy("pos")
      val keep = s.withColumn("nxt", lead(col("sym"), 1).over(w))
        .filter(col("sym") === a && col("nxt") === b)
        .withColumn("mrank", row_number().over(w))
        .withColumn("island", col("pos") - col("mrank"))
        .withColumn("imin",
          min("pos").over(Window.partitionBy("word", "island")))
        .filter(((col("pos") - col("imin")) % 2) === 0)
        .select(col("word"), col("pos"))
      val dropped = s.join(
        keep.select(col("word"), (col("pos") + 1).as("pos")),
        Seq("word", "pos"), "left_anti")
      val prev = s
      s = dropped
        .join(keep.withColumn("hit", lit(true)), Seq("word", "pos"), "left")
        .withColumn("sym", when(col("hit"), lit(a + b)).otherwise(col("sym")))
        .withColumn("pos", row_number().over(
          Window.partitionBy("word").orderBy("pos")) - 1)
        .select("word", "freq", "pos", "sym")
        .localCheckpoint(true)
      prev.unpersist(blocking = false)
    }
    s.select("word", "pos", "sym")
  }
}
