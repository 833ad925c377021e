package graft.operators

import graft.model.ExpressionMatrix
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Normalisation operators — SURVEY.md §2.4 A4, A15, A17.
  *
  * Quantile normalisation is the classic two-window formulation; CPM
  * is pure column algebra over a per-sample aggregate. Both stay in
  * whole-stage codegen and shuffle exactly once per keyed step.
  */
object Normalize {

  /** A4 — library sizes: `colSums(data)` (`GenExpressionComb_RNAseq.R:144`). */
  def librarySizes(m: ExpressionMatrix): DataFrame =
    m.df.groupBy(m.sampleCol).agg(sum(m.valueCol).as("lib_size"))

  /** A17 — quantile normalisation
    * (`GenExpressionComb_Affy_HuEx1ST.R:197-199`, aroma
    * `QuantileNormalization`): replace each sample's k-th order
    * statistic by the mean of the k-th order statistics across
    * samples. Two windows: a per-sample rank (ties broken on gene id
    * for determinism) and a mean per rank joined back.
    *
    * Scale note: the rank window partitions by sample — at 100 TB the
    * matrix is sample-partitioned and each partition sorts locally;
    * the rank→mean relation has one row per (rank), i.e. ≤ #genes, and
    * joins back by shuffle on rank.
    */
  def quantileNormalize(m: ExpressionMatrix): ExpressionMatrix = {
    val wRank = Window.partitionBy(m.sampleCol).orderBy(m.valueCol.asc, m.geneCol.asc)
    val ranked = m.df.withColumn("__rk", row_number().over(wRank))
    val rankMeans = ranked.groupBy(col("__rk")).agg(avg(m.valueCol).as("__rkmean"))
    val normed = ranked.join(rankMeans, Seq("__rk"))
      .select(m.geneCol, m.sampleCol, col("__rkmean").as(m.value))
    m.copy(df = normed)
  }

  /** A15 — log2-CPM, the deterministic half of voom
    * (`DiffExpression_openPlatform.R:440-443`):
    * `log2((count + 0.5) / (lib_size + 1) * 1e6)`. */
  def log2Cpm(counts: ExpressionMatrix): ExpressionMatrix = {
    val libs = librarySizes(counts)
    counts.copy(df = counts.df.join(libs, Seq(counts.sample))
      .withColumn(counts.value,
        log2((counts.valueCol + 0.5) / (col("lib_size") + 1.0) * 1e6))
      .drop("lib_size"))
  }

  /** A15 — voom precision weights. The mean–variance trend is fitted
    * driver-side (lowess on one point per gene — bounded by gene
    * count, not data size) and broadcast back as a piecewise-linear
    * lookup, mirroring limma's `voom` structure. The trend fit here is
    * a simple monotone binned regression: deterministic, no RNG. */
  def voomWeights(logCpm: ExpressionMatrix, bins: Int = 100): DataFrame = {
    val perGene = logCpm.df.groupBy(logCpm.geneCol)
      .agg(avg(logCpm.valueCol).as("mean_lcpm"),
           sqrt(stddev_samp(logCpm.valueCol)).as("sqrt_sd"))
      .filter(col("sqrt_sd").isNotNull)
    // bin by mean, average sqrt-sd per bin -> piecewise-constant trend
    val binned = perGene
      .withColumn("__bin", ntile(bins).over(Window.orderBy(col("mean_lcpm").asc, logCpm.geneCol.asc)))
    val trend = binned.groupBy(col("__bin")).agg(avg(col("sqrt_sd")).as("trend_sqrt_sd"))
    binned.join(trend, Seq("__bin"))
      .select(logCpm.geneCol, col("mean_lcpm"),
        (lit(1.0) / (col("trend_sqrt_sd") * col("trend_sqrt_sd") * col("trend_sqrt_sd") * col("trend_sqrt_sd"))).as("weight"))
  }

  /** A16 — CQN-lite: per-dataset quantile normalisation plus the
    * reference's post-CQN floor (`GenExpressionComb_RNAseq.R:183-201`:
    * spline-based conditional quantile normalisation; v1 implements
    * the quantile component per dataset and the `<2 → 0` clamp F9,
    * with the GC/length spline recorded as a divergence). */
  def cqnLite(counts: ExpressionMatrix, clampBelow: Double = 2.0): ExpressionMatrix =
    Filters.clampLow(quantileNormalize(log2Cpm(counts)), clampBelow)
}
