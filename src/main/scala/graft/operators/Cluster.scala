package graft.operators

import graft.model.ExpressionMatrix
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A8/A9 — clustering utilities (`Study_effect.R:450-531`,
  * `DiffExpression_closedPlatform.R:645-683`).
  *
  * The reference clusters *samples* (≤ a few hundred), so the
  * distance matrix is tiny: it is computed distributed (self-join on
  * gene) and the linkage runs on the driver — deterministic
  * Lance–Williams Ward (explicitly "ward.D" semantics, the choice the
  * reference inherited from pre-3.1 R; recorded per SURVEY §7.4.7).
  */
object Cluster {

  /** Pairwise squared Euclidean distances between samples over their
    * gene vectors — distributed, one shuffle on gene. */
  def sampleDistances(m: ExpressionMatrix): DataFrame = {
    val a = m.canonical.df.select(col("gene_id"), col("sample_id").as("s1"), col("value").as("v1"))
    val b = m.canonical.df.select(col("gene_id"), col("sample_id").as("s2"), col("value").as("v2"))
    a.join(b, Seq("gene_id")).filter(col("s1") < col("s2"))
      .groupBy("s1", "s2")
      .agg(sum((col("v1") - col("v2")) * (col("v1") - col("v2"))).as("dist2"),
           count(lit(1)).as("n_genes"))
  }

  /** A9 — classical multidimensional scaling (`cmdscale`,
    * `Study_effect.R:508-531`: `cmdscale(d.usa, eig=TRUE, k=2)` feeds
    * the k-means study-effect plot). Double-center B = −½·J·D²·J on
    * the collected samples² distance matrix (bounded at reference
    * scale — the gene dimension never leaves the cluster: distances
    * come from [[sampleDistances]]' distributed self-join), eigen-
    * decompose on the driver, coordinates = v_i·√λ_i for the top k
    * positive eigenvalues. Sign convention: each coordinate column is
    * flipped so its largest-|·| entry is positive — `cmdscale` leaves
    * sign arbitrary; this makes output deterministic. Returns
    * (sample_id, c1..ck) plus the eigenvalue per dimension. */
  def cmdscale(distances: DataFrame, k: Int): DataFrame = {
    val spark = distances.sparkSession
    val d0 = distances.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val samples = d0.keysIterator.flatMap { case (a, b) => Seq(a, b) }.toSeq.distinct.sorted
    val n = samples.size
    val idx = samples.zipWithIndex.toMap
    val d2 = Array.ofDim[Double](n, n)
    for (((a, b), v) <- d0) { d2(idx(a))(idx(b)) = v; d2(idx(b))(idx(a)) = v }
    val rowMean = d2.map(_.sum / n)
    val grand = rowMean.sum / n
    val bMat = Array.tabulate(n, n)((i, j) =>
      -0.5 * (d2(i)(j) - rowMean(i) - rowMean(j) + grand))
    // top-k eigenpairs by deterministic power iteration with
    // deflation: B is PSD for Euclidean D², only k (=2 typically)
    // pairs are needed, and unlike a full tridiagonalization this
    // cannot hit an iterative-QR convergence failure on large sample
    // counts. Seeded start vector; 500 fixed iterations ≫ enough for
    // the well-separated leading study-effect axes.
    val work = bMat.map(_.clone())
    val coords = (0 until k).map { d =>
      val (lam, v) = Cluster.powerIter(work, d)
      // convergence guard (cmdscale leaves degeneracy silent): when the
      // leading eigenvalues nearly tie, 500 fixed iterations can return
      // an arbitrary mixture of the tied axes — detect via the
      // eigen-residual rather than silently emitting mixed coordinates
      val res = (0 until n).map { i =>
        val bv = (0 until n).map(j => work(i)(j) * v(j)).sum
        math.abs(bv - lam * v(i))
      }.max / math.max(math.abs(lam), 1.0)
      if (res > 1e-6)
        System.err.println(
          s"[graft] WARN cmdscale axis ${d + 1}: power-iteration residual $res > 1e-6 " +
            "(near-tied eigenvalues); returned axis may be a mixture")
      // deflate: B ← B − λ v vᵀ
      for (i <- 0 until n; j <- 0 until n) work(i)(j) -= lam * v(i) * v(j)
      val scaled = v.map(_ * math.sqrt(math.max(lam, 0.0)))
      val maxAbs = scaled.maxBy(math.abs)
      (lam, if (maxAbs < 0) scaled.map(-_) else scaled)
    }
    val rows = samples.zipWithIndex.map { case (s, i) =>
      org.apache.spark.sql.Row.fromSeq(s +: coords.toSeq.flatMap { case (lam, c) => Seq(c(i), lam) })
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("sample_id",
        org.apache.spark.sql.types.StringType) +:
      (1 to k).flatMap(i => Seq(
        org.apache.spark.sql.types.StructField(s"c$i",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField(s"eig$i",
          org.apache.spark.sql.types.DoubleType))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)
  }

  /** Dominant eigenpair by 500 fixed power-iteration steps on a
    * bounded symmetric matrix. The start vector uses small-modulus
    * integer arithmetic (every intermediate < 2^31, exactly
    * representable) so the q62/q43 oracles' recursive CTEs reproduce
    * it with plain BIGINT ops — no 64-bit wraparound emulation. Shared
    * by cmdscale (B matrix) and QC.pca (gene covariance); callers
    * deflate between extractions. */
  private[operators] def powerIter(m: Array[Array[Double]], seed: Int): (Double, Array[Double]) = {
    val n = m.length
    var v = Array.tabulate(n) { i =>
      (((i + 1) * 40503 + seed * 7919) % 65536).toDouble / 65536.0 - 0.5
    }
    var lam = 0.0
    var it = 0
    while (it < 500) {
      val w = Array.ofDim[Double](n)
      var i = 0
      while (i < n) {
        var acc = 0.0; var j = 0
        while (j < n) { acc += m(i)(j) * v(j); j += 1 }
        w(i) = acc; i += 1
      }
      val norm = math.sqrt(w.map(x => x * x).sum)
      if (norm < 1e-300) return (0.0, v)
      lam = v.zip(w).map { case (a, b) => a * b }.sum
      v = w.map(_ / norm)
      it += 1
    }
    (lam, v)
  }

  final case class Merge(step: Int, left: String, right: String, height: Double, size: Int)

  /** Ward.D agglomeration on a collected distance matrix. Cluster
    * labels are the sorted-joined member ids so output is
    * deterministic regardless of driver map ordering; ties in minimum
    * distance break on label order. */
  def wardLinkage(distances: DataFrame): Seq[Merge] = {
    val d0 = distances.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val samples = d0.keysIterator.flatMap { case (a, b) => Seq(a, b) }.toSeq.distinct.sorted
    var dist = scala.collection.mutable.Map[(String, String), Double]()
    for (((a, b), v) <- d0) dist(if (a < b) (a, b) else (b, a)) = v
    var clusters = samples.map(s => s -> Seq(s)).to(scala.collection.mutable.LinkedHashMap)
    def key(a: String, b: String) = if (a < b) (a, b) else (b, a)
    val merges = Seq.newBuilder[Merge]
    var step = 0
    while (clusters.size > 1) {
      step += 1
      val pairs = clusters.keys.toSeq.sorted
      var best: Option[((String, String), Double)] = None
      for (i <- pairs.indices; j <- i + 1 until pairs.size) {
        val k = key(pairs(i), pairs(j))
        val v = dist.getOrElse(k, Double.MaxValue)
        if (best.isEmpty || v < best.get._2) best = Some((k, v))
      }
      val ((ca, cb), h) = best.get
      val na = clusters(ca).size.toDouble
      val nb = clusters(cb).size.toDouble
      val merged = (clusters(ca) ++ clusters(cb)).sorted
      val newLabel = merged.mkString("+")
      merges += Merge(step, ca, cb, h, merged.size)
      // Lance–Williams update for Ward.D
      for (c <- clusters.keys if c != ca && c != cb) {
        val nc = clusters(c).size.toDouble
        val dac = dist(key(ca, c)); val dbc = dist(key(cb, c)); val dab = dist(key(ca, cb))
        val nd = ((na + nc) * dac + (nb + nc) * dbc - nc * dab) / (na + nb + nc)
        dist(key(newLabel, c)) = nd
      }
      clusters.remove(ca); clusters.remove(cb)
      clusters(newLabel) = merged
    }
    merges.result()
  }
}
