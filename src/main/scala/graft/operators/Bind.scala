package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J6/J7 — the frozen topTable/Bind output contract.
  *
  * J6 (`DiffExpression_closedPlatform.R:81-106,598-608`): every
  * per-contrast topTable is written with gene annotation prepended —
  * `annotGenes` joins 8 biomaRt columns, drops the duplicate
  * `ensembl_gene_id`, and rows without annotation get NA in all
  * annotation columns. After `prepare2write` prepends the rowname,
  * the positional layout is:
  *
  *   0 gene · 1 hgnc_symbol · 2 description · 3 chromosome_name ·
  *   4 band · 5 strand · 6 start_position · 7 end_position ·
  *   8 log2FC · 9 t_statistic · 10 p_value · 11 adj_p_value
  *
  * Downstream consumers read columns POSITIONALLY — `Meta_analysis.R:
  * 1082-1087` and `Bind_Meta2DElists.pl:218` take `info[8]` (log2FC)
  * and `info[11]` (adjusted p) — so this column order is a frozen
  * contract, asserted by BindSpec's golden TSV read-back.
  *
  * J7 (`Bind_Meta2DElists.pl:84-151,169-331`): meta-analysis rows are
  * bound with each study's (log2FC, adj p) pair by gene — NA when the
  * study lacks the gene — plus optional semantics: `known` genes get a
  * yes/No flag column, `mark` lists prefix the gene id with their mark
  * character, and `exclude` genes are routed to a SEPARATE relation
  * (the `_excluded` file) rather than dropped.
  */
object Bind {

  /** The 7 annotation columns that follow the gene id (biomaRt
    * attribute order minus the joined id itself). */
  val annotationCols: Seq[String] = Seq("hgnc_symbol", "description",
    "chromosome_name", "band", "strand", "start_position", "end_position")

  /** The 4 statistic columns of the reference's trimmed topTable
    * (`topGenes[, c("logFC","t","P.Value","adj.P.Val")]`, renamed). */
  val statCols: Seq[String] = Seq("log2FC", "t_statistic", "p_value", "adj_p_value")

  /** Annotation relation normalised to the J6 column set: extra
    * columns dropped, missing ones null-filled. */
  private def annotFilled(annot: DataFrame, gene: String): DataFrame =
    annotationCols.foldLeft(
        annot.select(col(gene) +: annot.columns.filter(annotationCols.contains)
          .map(col).toSeq: _*)) {
      (d, c) => if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast("string"))
    }

  /** J6 — annotated topTable. `topTable` needs (gene, log2fc, t, p,
    * p_bh); `annot` carries (gene, [[annotationCols]]...) — extra
    * columns are ignored, missing ones filled with null. Left join:
    * unannotated genes keep NA annotation rows, exactly like
    * `annotGenes`' notAnnotated block. Output column ORDER is the
    * frozen positional contract. Broadcast join on the bounded
    * annotation relation; writers re-impose the p ranking on output. */
  def annotatedTopTable(topTable: DataFrame, annot: DataFrame,
      gene: String = "gene_id"): DataFrame = {
    val a = annotFilled(annot, gene)
    val renamed = topTable
      .withColumnRenamed("log2fc", "log2FC")
      .withColumnRenamed("t", "t_statistic")
      .withColumnRenamed("p", "p_value")
      .withColumnRenamed("p_bh", "adj_p_value")
    renamed.join(broadcast(a), Seq(gene), "left")
      .select((col(gene).as("gene") +: annotationCols.map(col)) ++ statCols.map(col): _*)
  }

  /** J6 × contrasts — the reference writes ONE annotated topTable per
    * contrast (`DiffExpression_closedPlatform.R:598-633` loops the
    * contrast matrix, calling `annotGenes` + `prepare2write` per
    * column), and the meta stage later reads each file's col-8/col-11.
    * This is that composition as a single long relation: the
    * multi-contrast table ([[graft.operators.DiffExpr.moderatedTAll]]
    * + per-contrast BH — columns gene, contrast, log2fc, t_mod, p_mod,
    * p_bh) annotated ONCE with a broadcast join (not once per
    * contrast), keyed (contrast, gene) with the frozen positional
    * layout per contrast. A writer partitioning by `contrast` emits
    * exactly the reference's per-contrast files. */
  def annotatedTopTablesByContrast(contrastTable: DataFrame, annot: DataFrame,
      gene: String = "gene_id"): DataFrame = {
    val a = annotFilled(annot, gene)
    val renamed = contrastTable
      .withColumnRenamed("log2fc", "log2FC")
      .withColumnRenamed("t_mod", "t_statistic")
      .withColumnRenamed("p_mod", "p_value")
      .withColumnRenamed("p_bh", "adj_p_value")
    renamed.join(broadcast(a), Seq(gene), "left")
      .select((col("contrast") +: col(gene).as("gene") +: annotationCols.map(col)) ++
        statCols.map(col): _*)
  }

  /** J7 — bind meta results with per-study DE statistics. Returns
    * (bound, excluded): `excluded` holds the rows whose gene is in
    * `exclude` (they are reported, not dropped — the `_excluded`
    * file), both relations share the schema: meta columns (gene id
    * mark-prefixed when in a mark list), optional `known` yes/No
    * column, then per-study `<id>_log2FC`, `<id>_adj_p` pairs (null =
    * the study lacks the gene). The list relations (known/exclude/
    * marks) are metadata-sized → broadcast joins; the per-study
    * topTables join on the gene key with the strategy left to the
    * optimizer — AQE broadcasts them when they are gene-bounded, and
    * falls back to a shuffle join if a study relation is data-sized
    * (an unconditional broadcast here would be an OOM trap). */
  def bindMetaToDE(meta: DataFrame, studies: Seq[(String, DataFrame)],
      known: Option[DataFrame] = None, exclude: Option[DataFrame] = None,
      marks: Option[DataFrame] = None,
      gene: String = "gene_id"): (DataFrame, DataFrame) = {
    val withStudies = studies.foldLeft(meta) { case (d, (id, tt)) =>
      d.join(tt.select(col(gene),
          col("log2FC").as(s"${id}_log2FC"),
          col("adj_p_value").as(s"${id}_adj_p")),
        Seq(gene), "left")
    }
    val withKnown = known match {
      case Some(k) =>
        withStudies.join(
            broadcast(k.select(col(gene)).distinct().withColumn("__known", lit(true))),
            Seq(gene), "left")
          .withColumn("known", when(col("__known"), "yes").otherwise("No"))
          .drop("__known")
      case None => withStudies
    }
    val flagged = exclude match {
      case Some(e) =>
        withKnown.join(
          broadcast(e.select(col(gene)).distinct().withColumn("__excl", lit(true))),
          Seq(gene), "left")
      case None => withKnown.withColumn("__excl", lit(null).cast("boolean"))
    }
    val marked = marks match {
      case Some(mk) =>
        flagged.join(broadcast(mk.select(col(gene), col("mark"))), Seq(gene), "left")
          .withColumn(gene,
            when(col("mark").isNotNull, concat(col("mark"), lit("_"), col(gene)))
              .otherwise(col(gene)))
          .drop("mark")
      case None => flagged
    }
    (marked.filter(col("__excl").isNull).drop("__excl"),
     marked.filter(col("__excl")).drop("__excl"))
  }
}
