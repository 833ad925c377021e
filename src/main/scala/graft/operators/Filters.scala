package graft.operators

import graft.model.ExpressionMatrix
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Projection / filter operators — SURVEY.md §2.2 (F1–F14).
  *
  * All are expressed as declarative DataFrame transforms so Catalyst
  * pushes predicates to the scan, prunes columns, and broadcasts the
  * (always small) metadata side of semi/anti joins.
  */
object Filters {

  /** F1 — outlier-sample removal (`GenExpressionComb_Affy_U133Plus2.R:113-129`):
    * drop samples listed in an outlier table. Anti-join with a
    * broadcast of the (tiny) outlier list. */
  def removeOutliers(m: ExpressionMatrix, outliers: DataFrame, outlierCol: String = "sample_id"): ExpressionMatrix =
    m.copy(df = m.df.join(
      broadcast(outliers.select(col(outlierCol).as(m.sample)).distinct()),
      Seq(m.sample), "left_anti"))

  /** F2 — reliable-probe semi-join (`GenExpressionComb_Affy_U133Plus2.R:131-140`):
    * keep only probes present in the platform `.flat` file. */
  def keepReliableProbes(m: ExpressionMatrix, flat: DataFrame, probeCol: String = "probe"): ExpressionMatrix =
    m.copy(df = m.df.join(
      broadcast(flat.select(col(probeCol).as(m.gene)).distinct()),
      Seq(m.gene), "left_semi"))

  /** F4 — zero-variance gene filter (`DiffExpression_closedPlatform.R:374-376`):
    * `data[apply(data,1,sd) > 0, ]`. One aggregation + semi join back;
    * the aggregation is partial/map-side combined by Catalyst. */
  def dropZeroVariance(m: ExpressionMatrix): ExpressionMatrix = {
    val keep = m.df.groupBy(m.geneCol).agg(stddev_samp(m.valueCol).as("sd"))
      .filter(col("sd") > 0).select(m.geneCol)
    m.copy(df = m.df.join(keep, Seq(m.gene), "left_semi"))
  }

  /** F5/W1 — non-specific (variance) filter
    * (`DiffExpression_closedPlatform.R:443-450`, `Study_effect.R:186-231`):
    * keep the top-N genes by across-sample SD. The ranking input is
    * one row per gene (≤ ~300k), so the global sort is trivial; ties
    * break deterministically on gene id. */
  def topNBySd(m: ExpressionMatrix, n: Int): ExpressionMatrix = {
    val sd = m.df.groupBy(m.geneCol).agg(stddev_samp(m.valueCol).as("sd"))
    val keep = sd.withColumn("rk",
        row_number().over(Window.orderBy(col("sd").desc, m.geneCol.asc)))
      .filter(col("rk") <= n).select(m.geneCol)
    m.copy(df = m.df.join(keep, Seq(m.gene), "left_semi"))
  }

  /** F5 fractional variant — keep the top `frac` of genes by SD
    * (60% closed-platform, 50% open-platform). */
  def topFracBySd(m: ExpressionMatrix, frac: Double): ExpressionMatrix = {
    val sd = m.df.groupBy(m.geneCol).agg(stddev_samp(m.valueCol).as("sd"))
    val keep = sd.withColumn("pr", percent_rank().over(Window.orderBy(col("sd").asc, m.geneCol.asc)))
      .filter(col("pr") >= 1.0 - frac).select(m.geneCol)
    m.copy(df = m.df.join(keep, Seq(m.gene), "left_semi"))
  }

  /** F4+F5 fused — the E1/E2 chain stage "drop zero-variance genes,
    * then keep the top `frac` by SD". Identical results to
    * `topFracBySd(dropZeroVariance(m), frac)` (the rank set is the
    * sd > 0 genes either way), but the per-gene SD aggregates once and
    * the data-sized relation is semi-joined once — half the shuffle
    * rounds of the composition. */
  def topFracBySdNonZero(m: ExpressionMatrix, frac: Double): ExpressionMatrix = {
    val sd = m.df.groupBy(m.geneCol).agg(stddev_samp(m.valueCol).as("sd"))
      .filter(col("sd") > 0)
    val keep = sd.withColumn("pr", percent_rank().over(Window.orderBy(col("sd").asc, m.geneCol.asc)))
      .filter(col("pr") >= 1.0 - frac).select(m.geneCol)
    m.copy(df = m.df.join(keep, Seq(m.gene), "left_semi"))
  }

  /** F6 — gene exclusion list (`DiffExpression_closedPlatform.R:340-344`). */
  def excludeGenes(m: ExpressionMatrix, genes: DataFrame, geneCol: String = "gene_id"): ExpressionMatrix =
    m.copy(df = m.df.join(broadcast(genes.select(col(geneCol).as(m.gene)).distinct()),
      Seq(m.gene), "left_anti"))

  /** F8 — zero-count partition (`GenExpressionComb_RNAseq.R:149-152`):
    * split genes whose counts are all zero into a side relation;
    * returns (nonzero, allZero). */
  def partitionZeroCounts(m: ExpressionMatrix): (ExpressionMatrix, ExpressionMatrix) = {
    val sums = m.df.groupBy(m.geneCol).agg(sum(abs(m.valueCol)).as("s"))
    val zeroGenes = sums.filter(col("s") === 0).select(m.geneCol)
    (m.copy(df = m.df.join(zeroGenes, Seq(m.gene), "left_anti")),
     m.copy(df = m.df.join(zeroGenes, Seq(m.gene), "left_semi")))
  }

  /** F9 — low-expression clamp (`GenExpressionComb_RNAseq.R:192-194`):
    * log2 values < threshold → 0 ("<4 reads ≡ not expressed"). */
  def clampLow(m: ExpressionMatrix, threshold: Double = 2.0): ExpressionMatrix =
    m.copy(df = m.df.withColumn(m.value,
      when(m.valueCol < threshold, lit(0.0)).otherwise(m.valueCol)))

  /** F10 — DABG present/absent filter
    * (`GenExpressionComb_Affy_HuEx1ST_DABGfilter.R` ~:236-370):
    * a probeset is "present" in a biological group when its log2
    * intensity clears `presentThresh` in ≥ half of the group's
    * samples; probesets absent in every group are dropped.
    * `groups` maps sample_id → group. Pure boolean aggregation. */
  def dabgFilter(m: ExpressionMatrix, groups: DataFrame,
      presentThresh: Double = 3.0, minGroupFrac: Double = 0.5): ExpressionMatrix =
    dabgFilterGrouped(m, m.df.join(broadcast(groups), Seq(m.sample)),
      presentThresh, minGroupFrac)

  /** F10 variant for when the biological group is already a column of
    * the observation relation (no sample join needed). `withGroup`
    * must carry the matrix's gene column plus `group` and the value. */
  def dabgFilterGrouped(m: ExpressionMatrix, withGroup: DataFrame,
      presentThresh: Double, minGroupFrac: Double): ExpressionMatrix = {
    val present = withGroup.groupBy(m.geneCol, col("group"))
      .agg(avg((m.valueCol >= presentThresh).cast("int")).as("frac_present"))
      .groupBy(m.geneCol)
      .agg(max((col("frac_present") >= minGroupFrac).cast("int")).as("present_any"))
      .filter(col("present_any") === 1).select(m.geneCol)
    m.copy(df = m.df.join(present, Seq(m.gene), "left_semi"))
  }

  /** F11 — replicate renumbering (`GenExpressionComb_Affy_U133Plus2.R:101-105`):
    * technical replicate ids from different datasets must not collide
    * after concatenation; the reference offsets each dataset's ids by
    * the running max. Equivalent deterministic form: dense rank over
    * (dataset, replicate) — same partition structure, no driver loop. */
  def renumberReplicates(target: DataFrame, dataset: String = "dataset",
      replicate: String = "replicate"): DataFrame = {
    val w = Window.orderBy(col(dataset).asc, col(replicate).asc)
    target.withColumn("replicate_global",
      when(col(replicate).isNull, lit(null))
        .otherwise(dense_rank().over(w)))
  }

  /** F12 — sample de-duplication (`Meta_analysis.R:201,211`):
    * `target[!duplicated(Name),]` — keep first occurrence per name with
    * a deterministic tiebreak ordering. */
  def dedupSamples(target: DataFrame, name: String, orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(name)).orderBy(orderBy: _*)
    target.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** F13 — zero-intensity repair (`GenExpressionComb_Illum_HT_12_V3.R:56-67`):
    * replace zeros with the per-sample minimum non-zero value
    * (pre-RSN guard against log2(0)). One window per sample. */
  def repairZeros(m: ExpressionMatrix): ExpressionMatrix = {
    val w = Window.partitionBy(m.sampleCol)
    m.copy(df = m.df
      .withColumn("__minpos", min(when(m.valueCol > 0, m.valueCol)).over(w))
      .withColumn(m.value, when(m.valueCol === 0, col("__minpos")).otherwise(m.valueCol))
      .drop("__minpos"))
  }

  /** F14 — HTSeq special-counter filter (`GenExpressionComb_RNAseq.pl:190-199`). */
  def dropSpecialCounters(m: ExpressionMatrix): ExpressionMatrix =
    m.copy(df = m.df.filter(!m.geneCol.startsWith("__")))
}
