package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication — the training-data-pipeline operators of
  * the brief: exact, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: nothing here compares all pairs. Exact dedup is a
  * hash groupBy; MinHash/SimHash bucket candidates through an
  * explode→shuffle on band/bucket keys so the pair space is bounded by
  * bucket co-membership; the Jaccard verify joins only candidate
  * pairs. All hashing is codegen'd column algebra (see
  * [[graft.functions.TextFunctions]]).
  */
object TextDedup {

  /** Exact dedup on a content hash: keep the lowest id per fingerprint
    * group. Survivors + a dup-count relation. */
  def exactDedup(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val fp = docs.withColumn("__fp", fingerprint(col(text)))
    val w = Window.partitionBy(col("__fp")).orderBy(col(id).asc)
    fp.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__fp")
  }

  /** MinHash + LSH candidate pairs with exact-Jaccard verification.
    * k = signature length, bands × rowsPerBand = k. Returns
    * (id_a, id_b, jaccard) for candidates above `minJaccard`.
    * `md5Hashes` selects the engine-portable hash family. */
  def minhashLshPairs(docs: DataFrame, k: Int = 8, bands: Int = 4,
      shingleWidth: Int = 3, minJaccard: Double = 0.0, md5Hashes: Boolean = false,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rowsPerBand = k / bands
    val sh = docs.select(col(id), array_distinct(shingles(tokens(col(text)), shingleWidth)).as("sh"))
    val sig = sh.withColumn("sig",
      if (md5Hashes) minhashMd5(col("sh"), k) else minhashXx(col("sh"), k))
    val banded = sig.select(col(id), col("sh"),
        explode(lshBands(col("sig"), bands, rowsPerBand)).as("band"))
    val a = banded.select(col("band"), col(id).as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col(id).as("id_b"), col("sh").as("sh_b"))
    val cand = a.join(b, Seq("band")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
    cand
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup pairs: fingerprints bucketed by (rotation,
    * 16-bit block) so pairs within `maxHamming` of each other collide
    * in ≥1 bucket (for maxHamming < #blocks); verified by exact
    * Hamming distance. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3, md5Bits: Boolean = false,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val nBlocks = 4
    val width = if (md5Bits) 8 else 16
    val fp = docs.select(col(id),
      (if (md5Bits) simhashMd5(tokens(col(text))) else simhashXx(tokens(col(text)))).as("simhash"))
    val blocks = fp.select(col(id), col("simhash"),
      explode(array((0 until nBlocks).map(bInd =>
        concat_ws(":", lit(bInd.toString),
          shiftright(col("simhash"), bInd * width)
            .bitwiseAND(lit((1L << width) - 1)).cast("string"))): _*)).as("bucket"))
    val a = blocks.select(col("bucket"), col(id).as("id_a"), col("simhash").as("h_a"))
    val b = blocks.select(col("bucket"), col(id).as("id_b"), col("simhash").as("h_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("h_a"), col("h_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** n-gram Jaccard similarity for an explicit candidate pair relation
    * (id_a, id_b): exact token-shingle Jaccard, no bucketing. Used as
    * the verify stage and for small within-group comparisons. */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, shingleWidth: Int = 3,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val sh = docs.select(col(id), array_distinct(shingles(tokens(col(text)), shingleWidth)).as("sh"))
    pairs
      .join(sh.select(col(id).as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col(id).as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding-cosine near-dup pairs above a threshold, via
    * [[Similarity.cosinePairs]]. */
  def embeddingDupPairs(embeddings: DataFrame, threshold: Double,
      id: String = "vec_id", vec: String = "embedding"): DataFrame =
    Similarity.cosinePairs(embeddings, id, vec).filter(col("cosine") >= threshold)
}
