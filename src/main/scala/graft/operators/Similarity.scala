package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbour / similarity search over an embedding
  * column (`array<float>`).
  *
  * Three tiers, per the brief:
  *  - brute-force cosine top-k (baseline; exact, O(Q·N));
  *  - random-hyperplane LSH buckets (scale path: candidates only
  *    within matching sign-sketches);
  *  - IVF-style coarse quantization via MLlib KMeans (scale path:
  *    probe the nearest `nProbe` centroids only).
  *
  * The dot-product kernel is `zip_with` + `aggregate` column algebra —
  * codegen'd, no UDF — computed in double after an explicit cast so
  * results are reproducible across engines.
  */
object Similarity {

  import graft.functions.VecDot.{vec_dot, vec_norm}
  import graft.functions.TopKPairs.top_k_pairs

  /** Bounded top-k per query via the partial-aggregable
    * [[graft.functions.TopKPairs]] — no full sort, shuffle carries
    * ≤ k rows per query. */
  private def topKOf(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(top_k_pairs(col("cosine"), col("corpus_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("r0", "kv")))
      .select(col("query_id"), col("kv.id").as("corpus_id"),
        (col("r0") + 1).cast("int").as("rank"), col("kv.score").as("cosine"))

  /** Cosine similarity between two array<float|double> columns
    * (native codegen'd dot-product kernel, see [[graft.functions.VecDot]]). */
  def cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))

  /** All-pairs cosine (id_a < id_b). Quadratic — use only on bounded
    * relations (the dedup verify stage or small candidate sets). */
  def cosinePairs(embeddings: DataFrame, id: String = "vec_id",
      vec: String = "embedding"): DataFrame = {
    val a = embeddings.select(col(id).as("id_a"), col(vec).as("v_a"))
    val b = embeddings.select(col(id).as("id_b"), col(vec).as("v_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cosine"))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors by cosine (ties broken on corpus id). The corpus
    * side stays distributed; queries are broadcast. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    // Precompute norms once per vector — the O(Q·N) pair loop then
    // runs only the dot-product kernel per pair, not three of them.
    val q = queries.select(col(id).as("query_id"), col(vec).as("q_vec"),
      vec_norm(col(vec)).as("q_norm"))
    val c = corpus.select(col(id).as("corpus_id"), col(vec).as("c_vec"),
      vec_norm(col(vec)).as("c_norm"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        (vec_dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm"))).as("cosine"))
    topKOf(scored, k)
  }

  /** Random-hyperplane (sign) sketch: `nBits` deterministic
    * Rademacher hyperplanes; bit i = sign(v · h_i). The hyperplanes
    * are generated driver-side with a fixed splitmix64 stream and
    * baked into the plan as array literals, so each bit is one
    * codegen'd [[graft.functions.VecDot]] loop — no per-dimension
    * expression nodes. */
  def hyperplaneSketch(vec: Column, dim: Int, nBits: Int, seedOffset: Int = 0): Column = {
    def splitmix64(seed: Long): Long = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val bits = (0 until nBits).map { i =>
      val h = Array.tabulate(dim)(d =>
        if ((splitmix64((i.toLong + seedOffset) * 1000003L + d) & 1L) == 1L) 1.0 else -1.0)
      val dot = graft.functions.VecDot.vec_dot(vec, lit(h))
      when(dot >= 0, lit(1L << (i % 63))).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: a candidate must share at least
    * one of `nBands` hyperplane-sketch bands of `bitsPerBand` bits
    * with the query (each band uses its own hyperplane family via a
    * seed offset). Recall rises with more bands, precision/cost with
    * more bits per band — the standard banding trade-off; `nBands=1`
    * degrades to the single-band sketch. Exact cosine is computed
    * only within buckets, each vector explodes into nBands rows, and
    * duplicate candidates collapse before scoring so a pair sharing
    * several bands is scored once. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      bitsPerBand: Int = 8, nBands: Int = 1,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val sk = (df: DataFrame, idAs: String, vecAs: String) =>
      df.select(col(id).as(idAs), col(vec).as(vecAs),
        explode(array((0 until nBands).map(b =>
          concat_ws("#", lit(b.toString),
            hyperplaneSketch(col(vec), dim, bitsPerBand, seedOffset = b * 7919)
              .cast("string"))): _*)).as("bucket"))
    val q = sk(queries, "query_id", "q_vec")
    val c = sk(corpus, "corpus_id", "c_vec")
    val cand = q.select("bucket", "query_id").join(c.select("bucket", "corpus_id"), Seq("bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select("query_id", "corpus_id").distinct()
    val qv = queries.select(col(id).as("query_id"), col(vec).as("q_vec"))
    val cv = corpus.select(col(id).as("corpus_id"), col(vec).as("c_vec"))
    val scored = cand.join(broadcast(qv), Seq("query_id")).join(cv, Seq("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("q_vec"), col("c_vec")).as("cosine"))
    topKOf(scored, k)
  }

  /** KMeans quantizer cache, keyed by (canonicalized corpus plan,
    * nCells): the IVF contract is fit-once / probe-many — a repeated
    * probe call must not refit the coarse quantizer. */
  private val quantizerCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), org.apache.spark.ml.clustering.KMeansModel]()

  /** Drop the quantizer memo — the bench clears all query-scoped
    * caches before each timed sample so "best of N" is best-of-cold. */
  private[graft] def clearCaches(): Unit = quantizerCache.clear()

  /** Fit (or fetch cached) the IVF coarse quantizer for a corpus. The
    * featurized corpus is persisted for the duration of the fit so the
    * KMeans iterations read it once, not once per step; the bridge to
    * MLlib vectors is the native `ml.functions.array_to_vector`, not a
    * hand-rolled closure. */
  def ivfQuantizer(corpus: DataFrame, nCells: Int,
      vec: String = "embedding"): org.apache.spark.ml.clustering.KMeansModel = {
    val key = (corpus.queryExecution.analyzed.canonicalized.hashCode(), nCells)
    quantizerCache.computeIfAbsent(key, _ => {
      val corpusV = corpus
        .select(org.apache.spark.ml.functions.array_to_vector(
          col(vec).cast("array<double>")).as("__fv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val model = new org.apache.spark.ml.clustering.KMeans()
        .setK(nCells).setSeed(42L).setFeaturesCol("__fv").setPredictionCol("cell")
        .fit(corpusV)
      corpusV.unpersist(blocking = false)
      model
    })
  }

  /** Deterministic Lloyd k-means for the IVF coarse quantizer — no
    * MLlib model state, so an oracle can replay the fit exactly: the
    * fit runs driver-side over a BOUNDED sample (`sampleCap` lowest
    * ids — the 100 TB contract: quantizers fit on samples, the corpus
    * never leaves the cluster), init = the `nCells` lowest-id vectors,
    * `iters` fixed assignment/update rounds (argmin squared distance,
    * ties to the lower cell; empty cells carry their previous
    * centroid). Returns (cell, centroid array<float>) for
    * [[ivfTopK]]'s `centroids` parameter. */
  def lloydCentroids(corpus: DataFrame, nCells: Int, iters: Int, dim: Int,
      id: String = "vec_id", vec: String = "embedding",
      sampleCap: Int = 1000): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample: Array[Array[Double]] = corpus.filter(col(id) < sampleCap)
      .orderBy(col(id)).select(col(vec)).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    var cents: Array[Array[Double]] = sample.take(nCells).map(_.clone())
    var t = 0
    while (t < iters) {
      val sums = Array.fill(nCells)(Array.ofDim[Double](dim))
      val counts = Array.ofDim[Long](nCells)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < nCells) {
          var dist = 0.0; var d = 0
          while (d < dim) {
            val t0 = v(d) - cents(c)(d); dist += t0 * t0; d += 1
          }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        counts(best) += 1
        var d = 0
        while (d < dim) { sums(best)(d) += v(d); d += 1 }
      }
      cents = cents.zipWithIndex.map { case (c, cellId) =>
        if (counts(cellId) > 0)
          Array.tabulate(dim)(d => sums(cellId)(d) / counts(cellId))
        else c
      }
      t += 1
    }
    cents.zipWithIndex.map { case (c, i) => (i, c.map(_.toFloat).toSeq) }
      .toSeq.toDF("cell", "centroid")
  }

  /** IVF-style ANN: KMeans coarse quantizer (deterministic seed), each
    * vector assigned to its centroid list; queries probe the nearest
    * `nProbe` centroids and rank exact cosine within those cells. At
    * scale the corpus is partitioned by cell id — a probe touches
    * nProbe/nCells of the data. Pass `centroids` (cell, centroid
    * array<float>) to skip the fit entirely — the 100 TB path fits the
    * quantizer once on a sample and reuses the relation. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nCells: Int,
      nProbe: Int, id: String = "vec_id", vec: String = "embedding",
      centroids: Option[DataFrame] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // Centroids are structurally bounded (nCells rows) — collect and
    // bake them into the plan as literals, like hyperplaneSketch does.
    val cents: Seq[(Int, Array[Float])] = centroids match {
      case Some(df) => df.select(col("cell").cast("int"), col("centroid"))
        .collect().toSeq.map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      case None =>
        val model = ivfQuantizer(corpus, nCells, vec)
        model.clusterCenters.zipWithIndex.map { case (cVec, i) =>
          (i, cVec.toArray.map(_.toFloat))
        }.toSeq
    }
    val centDf = cents.map { case (i, a) => (i, a.toSeq) }.toDF("cell", "centroid")
    // Nearest-centroid assignment as pure codegen'd column algebra:
    // argmin over cells of |c|^2 - 2 v·c (== argmin Euclidean for a
    // fixed v) via least() over (dist, cell) structs with literal
    // centroid arrays — one vec_dot loop per cell, no join, no
    // shuffle, no MLlib row UDF on the corpus-sized side.
    val distStructs = cents.map { case (cellId, arr) =>
      val c2 = arr.foldLeft(0.0)((s, v) => s + v.toDouble * v.toDouble)
      struct((lit(c2) - lit(2.0) * vec_dot(col("c_vec"), lit(arr))).as("d"),
        lit(cellId).as("cell"))
    }
    val assigned = corpus.select(col(id).as("corpus_id"), col(vec).as("c_vec"),
      least(distStructs: _*).getField("cell").as("cell"))
    val q = queries.select(col(id).as("query_id"), col(vec).as("q_vec"))
    val probed = broadcast(q).crossJoin(broadcast(centDf))
      .withColumn("cdist", cosine(col("q_vec"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cdist").desc, col("cell").asc)))
      .filter(col("crank") <= nProbe)
      .select("query_id", "q_vec", "cell")
    val scored = probed.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("q_vec"), col("c_vec")).as("cosine"))
    topKOf(scored, k)
  }
}
