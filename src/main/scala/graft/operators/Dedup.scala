package graft.operators

import graft.model.ExpressionMatrix
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Probe→gene summarisation operators — SURVEY.md §2.4 A2/A3.
  *
  * The probe→gene mapping arrives as an annotation relation
  * `(probe, gene_id)`; both operators are a broadcast join plus a
  * single shuffle keyed on the output grain.
  */
object Dedup {

  /** A2 — max-variance dedup (`MultiGene2ProbeFilter.R:19-71`):
    * among probes mapped to the same gene keep the probe whose values
    * have the highest across-sample variance; unmapped probes drop.
    * One aggregation to score probes, one window to pick the winner,
    * one semi join back — ties break on probe id for determinism. */
  def maxVarianceDedup(probes: ExpressionMatrix, annot: DataFrame,
      probeCol: String = "probe", geneCol: String = "gene_id"): ExpressionMatrix = {
    val mapped = probes.df.join(broadcast(
      annot.select(col(probeCol).as(probes.gene), col(geneCol).as("__gene"))), Seq(probes.gene))
    val score = mapped.groupBy(probes.geneCol, col("__gene"))
      .agg(var_samp(probes.valueCol).as("__var"))
    val winner = score.withColumn("__rn", row_number().over(
        Window.partitionBy(col("__gene")).orderBy(col("__var").desc, probes.geneCol.asc)))
      .filter(col("__rn") === 1)
      .select(probes.geneCol, col("__gene"))
    ExpressionMatrix(mapped.join(winner, Seq(probes.gene, "__gene"), "left_semi")
      .select(col("__gene").as("gene_id"), probes.sampleCol.as("sample_id"),
        probes.valueCol.cast("double").as("value")))
  }

  /** A3 — probe→gene aggregation by mean (`MultiGene2ProbeAvg.R:19-69`). */
  def meanCollapse(probes: ExpressionMatrix, annot: DataFrame,
      probeCol: String = "probe", geneCol: String = "gene_id"): ExpressionMatrix = {
    val mapped = probes.df.join(broadcast(
      annot.select(col(probeCol).as(probes.gene), col(geneCol).as("__gene"))), Seq(probes.gene))
    ExpressionMatrix(mapped.groupBy(col("__gene"), probes.sampleCol)
      .agg(avg(probes.valueCol).as("value"))
      .select(col("__gene").as("gene_id"), probes.sampleCol.as("sample_id"), col("value")))
  }
}
