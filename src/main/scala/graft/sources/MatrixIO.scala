package graft.sources

import graft.model.ExpressionMatrix
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1/S2 — TSV expression-matrix IO (SURVEY.md §2.1).
  *
  * The reference's canonical on-disk shape is a tab-separated matrix
  * with a header row and gene ids in an unnamed first column
  * (`read.table(..., row.names=1)`, `Meta_analysis.R:302`; writer
  * `prepare2write`, `Meta_analysis.R:42-47`). The engine reads that
  * shape straight into the long form and writes it back with a
  * deterministic row order so golden-file comparison is stable
  * (SURVEY.md §2.8).
  */
object MatrixIO {

  /** S1 — read a TSV matrix (first column = gene id, remaining
    * columns = samples) and melt to the canonical long form. */
  def readTsvMatrix(spark: SparkSession, path: String): ExpressionMatrix = {
    val wide = spark.read
      .option("sep", "\t").option("header", "true").option("inferSchema", "false")
      .csv(path)
    val geneCol = wide.columns.head
    ExpressionMatrix.melt(wide, geneCol)
  }

  /** S2 — write the long form as a TSV matrix mirroring
    * `prepare2write`: gene ids first column, one column per sample,
    * rows sorted by gene id. `sampleIds` fixes the column order (pass
    * `m.samples` for alphabetical). Single output file for golden
    * compatibility — only for reference-scale matrices; Parquet is
    * the internal format at scale. */
  def writeTsvMatrix(m: ExpressionMatrix, sampleIds: Seq[String], path: String): Unit =
    m.pivot(sampleIds)
      .orderBy(m.gene)
      .coalesce(1)
      .write.option("sep", "\t").option("header", "true")
      .mode("overwrite").csv(path)

  /** S7 — RSEM `.results` conversion
    * (`Convert_RSEMprocessed.pl:104-121`): RSEM writes a header row
    * and `SYMBOL|id`-keyed rows with the expected count in the second
    * column; the reference splits the key on `|`, maps the symbol to
    * an Ensembl id via the gene-info relation and DROPS unmapped
    * genes. `geneInfo` columns: (ensembl_id, symbol) — broadcast
    * inner join. Returns (gene_id, count, sample_id). */
  def readRsemResults(spark: SparkSession, path: String, sampleId: String,
      geneInfo: DataFrame): DataFrame = {
    val raw = spark.read.option("sep", "\t").option("header", "true").csv(path)
    val first = raw.columns(0)
    val second = raw.columns(1)
    raw.select(
        split(col(first), "\\|").getItem(0).as("symbol"),
        col(second).cast("double").as("count"))
      .join(broadcast(geneInfo.select(col("ensembl_id"), col("symbol"))), Seq("symbol"))
      .select(col("ensembl_id").as("gene_id"), col("count"), lit(sampleId).as("sample_id"))
  }

  /** S6 — HTSeq count-file scan (`GenExpressionComb_RNAseq.pl:184-203`):
    * per-sample two-column `gene_id \t count` with trailing `__*`
    * summary counters dropped (F14). */
  def readHtseqCounts(spark: SparkSession, path: String, sampleId: String): DataFrame =
    spark.read.option("sep", "\t").schema("gene_id STRING, count LONG").csv(path)
      .filter(!col("gene_id").startsWith("__"))
      .withColumn("sample_id", lit(sampleId))
}
