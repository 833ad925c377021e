package graft.operators

import graft.model.ExpressionMatrix
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join / set operators — SURVEY.md §2.3 (J1–J10) and §2.6.
  *
  * Every reference join is an equi-join on gene/sample/probe string
  * keys; metadata sides are small → broadcast. The matrix-shaped binds
  * become long-form unions + membership counts, which scale without a
  * wide pivot.
  */
object SetOps {

  /** J1 — bindDatasets (`Study_effect.R:37-50`): column-bind matrices
    * keeping only genes present in *all* datasets. Long form: union
    * with a dataset tag, then keep genes whose dataset count = N. */
  def bindDatasets(ms: Seq[(String, ExpressionMatrix)]): DataFrame = {
    val tagged = ms.map { case (name, m) =>
      m.canonical.df.withColumn("dataset", lit(name))
    }.reduce(_ unionByName _)
    val full = tagged.groupBy("gene_id")
      .agg(countDistinct("dataset").as("nds"))
      .filter(col("nds") === ms.size).select("gene_id")
    tagged.join(full, Seq("gene_id"), "left_semi")
  }

  /** J2 — full-outer count merge (`GenExpressionComb_RNAseq.pl:219-243`):
    * union of all genes across samples, missing counts → 0. In long
    * form nothing is missing until pivot; the dense completion is the
    * gene × sample cross product left-joined with observed counts. */
  def fullOuterMerge(m: ExpressionMatrix): DataFrame = {
    val genes = m.canonical.df.select("gene_id").distinct()
    val samples = m.canonical.df.select("sample_id").distinct()
    genes.crossJoin(samples)
      .join(m.canonical.df, Seq("gene_id", "sample_id"), "left")
      .withColumn("value", coalesce(col("value"), lit(0.0)))
  }

  /** J9 — union of DE gene universes (`Meta_analysis.R:1057-1063`). */
  def geneUniverse(dfs: Seq[DataFrame], gene: String = "gene_id"): DataFrame =
    dfs.map(_.select(col(gene))).reduce(_ unionByName _).distinct()

  /** A27 — Venn membership counts (limma `vennCounts`,
    * `DiffExpression_closedPlatform.R:586-594`): per key, a bitmask of
    * which sets contain it, counted per mask. Sets given as
    * (name, keys) DataFrames. */
  def vennCounts(sets: Seq[(String, DataFrame)], key: String): DataFrame = {
    // No per-set distinct needed: bit_or absorbs duplicates, so the
    // union shuffles once on the key instead of once per set.
    val tagged = sets.zipWithIndex.map { case ((name, df), i) =>
      df.select(col(key)).withColumn("__bit", lit(1L << i))
    }.reduce(_ unionByName _)
    tagged.groupBy(col(key)).agg(bit_or(col("__bit")).as("mask"))
      .groupBy(col("mask")).agg(count(lit(1)).as("n"))
  }
}
