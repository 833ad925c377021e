package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata model + catalog — the engine's replacement for the
  * reference's file-based workspace (SURVEY.md §1.2, FIXTURES.md).
  *
  * The reference coordinates its stages through tab-separated files:
  * the dataset registry `GenExpression_InputFiles.txt`
  * (`QC_Affy_U133Plus2.R:90-104`), per-dataset sample sheets
  * `target_<ID>.txt`, and outlier lists `outliers_<ID>.txt`
  * (`QC_Affy_U133Plus2.R:162-164`). Here those are typed relations in
  * one `Workspace`; stage hand-offs become DataFrame hand-offs (or
  * parquet checkpoint tables keyed by the same names).
  */
final case class DatasetMeta(dataset_name: String, target_file: String,
    dtype: String, platform: String)

final case class Sample(name: String, file_name: String, target: String,
    replicate: Option[Int], dataset_name: String)

final case class Outlier(dataset_name: String, sample_name: String)

final case class ProbeAnnot(probe: String, gene_id: String,
    gene_symbol: String, cigar: String, gene_no: Int)

final case class GeneInfo(gene_id: String, gene_symbol: String,
    length: Int, gc_content: Double)

final case class Workspace(registry: DataFrame, samples: DataFrame,
    outliers: DataFrame) {

  /** Samples of one dataset, outliers removed, duplicate names dropped
    * (F1 + F12 at load time, as every reference combiner does). */
  def cleanSamples(datasetName: String): DataFrame =
    samples.filter(col("dataset_name") === datasetName)
      .join(broadcast(outliers.filter(col("dataset_name") === datasetName)
        .select(col("sample_name").as("name"))), Seq("name"), "left_anti")
      .dropDuplicates("name")

  /** Biological group per sample across all datasets (the Target
    * column), for the DE / meta stages. */
  def groups: DataFrame =
    samples.select(col("name").as("sample_id"), col("target").as("group"))

  def datasetNames: Seq[String] =
    registry.select("dataset_name").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
}

object Workspace {
  /** Checkpoint an expression matrix as a bucketed+sorted table keyed
    * on gene_id — the co-location path for repeated per-gene stages
    * (DE → meta → FDR all shuffle on gene): downstream equi-joins and
    * aggregations on gene_id read the buckets back without an
    * Exchange. This is the cluster-scale replacement for the
    * reference's `.exp` stage files (SURVEY.md §3: stage checkpoints
    * land exactly where the reference had file hand-offs). */
  def checkpointBucketed(m: ExpressionMatrix, table: String, buckets: Int = 64): ExpressionMatrix = {
    val spark = m.df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a previous session may have left the managed location behind
    // without a catalog entry — clear it so the write is idempotent
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, table.toLowerCase)
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(warehouse)) fs.delete(warehouse, true)
    m.canonical.df.write
      .bucketBy(buckets, "gene_id")
      .sortBy("gene_id")
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
    ExpressionMatrix(m.df.sparkSession.table(table))
  }

  /** Stage-boundary checkpoint for the pipeline chains — the engine's
    * analogue of the reference's stage files (Comb_*.exp,
    * RNAseq_cqn.exp, topTables): eagerly materialize a DataFrame so
    * multi-branch downstream plans don't re-execute the upstream
    * lineage per action.
    *
    * Two modes, switched by `spark.graft.checkpoint.dir`:
    *   - UNSET (default): `localCheckpoint(eager)` — blocks live on
    *     executor block managers. Right for local[*]; on a real
    *     cluster an executor loss discards the blocks and the lineage
    *     is gone (localCheckpoint truncates it).
    *   - SET: the stage is written to `<dir>/<stage>.parquet` and read
    *     back — a RELIABLE checkpoint that survives executor loss,
    *     and a boundary table addressable by its stage name, exactly
    *     like the reference's per-stage files. One directory per
    *     analysis run (the reference's project-dir convention); stage
    *     names are the reference's file names. */
  def stageCheckpoint(df: DataFrame, stage: String): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.checkpoint.dir").filter(_.nonEmpty) match {
      case Some(dir) =>
        val path = s"$dir/$stage.parquet"
        df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      case None => df.localCheckpoint(true)
    }
  }

  /** Read the reference's three TSV shapes into a typed workspace. */
  def fromTsv(spark: SparkSession, registryPath: String,
      samplesPath: String, outliersPath: String): Workspace = {
    def tsv(p: String) = spark.read.option("sep", "\t").option("header", "true").csv(p)
    val registry = tsv(registryPath).select(
      col("DatasetName").as("dataset_name"), col("TargetFile").as("target_file"),
      col("Type").as("dtype"), col("Platform").as("platform"))
    val samples = tsv(samplesPath).select(
      col("Name").as("name"), col("FileName").as("file_name"),
      col("Target").as("target"),
      when(col("Replicate") === "NA", lit(null)).otherwise(col("Replicate"))
        .cast("int").as("replicate"),
      col("DatasetName").as("dataset_name"))
    // outliers arrive comma-joined per dataset (FIXTURES.md §3)
    val outliers = tsv(outliersPath)
      .select(col("DatasetName").as("dataset_name"),
        explode(split(col("Samples2exclude"), ",")).as("sample_name"))
      .filter(col("sample_name") =!= "" && col("sample_name") =!= "NA")
    Workspace(registry, samples, outliers)
  }
}
