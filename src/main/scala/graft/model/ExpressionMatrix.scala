package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The engine's canonical relation: a gene-by-sample expression matrix
  * in **long form** `(gene_id, sample_id, value)`.
  *
  * The reference keeps dense R matrices with genes as rownames and
  * samples as columns (reader `read.table(..., row.names=1)`,
  * `/root/reference/scripts/data_integration/Meta_analysis.R:302`;
  * writer `prepare2write`, `Meta_analysis.R:42-47`). Long form is the
  * scalable Spark representation: per-gene statistics are `groupBy`
  * aggregations, sample metadata attaches by broadcast join, and the
  * relation partitions/shuffles cleanly at 100 TB. Wide (pivoted)
  * matrices are materialised only per-analysis, at the API edge.
  */
final case class ExpressionMatrix(df: DataFrame,
    gene: String = "gene_id", sample: String = "sample_id", value: String = "value") {

  def geneCol: Column = col(gene)
  def sampleCol: Column = col(sample)
  def valueCol: Column = col(value)

  /** Standard column names — lets operators assume the canonical schema. */
  def canonical: ExpressionMatrix =
    if (gene == "gene_id" && sample == "sample_id" && value == "value") this
    else ExpressionMatrix(df.select(
      col(gene).as("gene_id"), col(sample).as("sample_id"), col(value).cast("double").as("value")))

  /** Wide matrix: one row per gene, one column per sample.
    * Only for bounded sample counts (reference scale: ≤ a few hundred
    * arrays) — the gene dimension stays distributed. */
  def pivot(sampleIds: Seq[String]): DataFrame =
    df.groupBy(col(gene)).pivot(sample, sampleIds).agg(first(col(value)))

  def samples: Seq[String] =
    df.select(col(sample)).distinct().collect().map(_.getString(0)).sorted.toSeq
}

object ExpressionMatrix {
  /** Melt a wide gene-by-sample DataFrame (first column = gene id,
    * remaining columns = samples) into long form — the inverse of the
    * reference's row-name matrix layout. Uses Spark's `unpivot`
    * (a single generate, no shuffle). */
  def melt(wide: DataFrame, geneCol: String): ExpressionMatrix = {
    val sampleCols = wide.columns.filterNot(_ == geneCol)
    val long = wide.unpivot(
      Array(col(geneCol).as("gene_id")),
      sampleCols.map(c => col(c).cast("double")),
      "sample_id", "value")
    ExpressionMatrix(long)
  }
}
