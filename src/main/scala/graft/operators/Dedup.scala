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

  /** A18 — RMA-style median-polish summarisation
    * (`GenExpressionComb_Affy_HuEx1ST.R:187-230`, aroma `ExonRmaPlm`):
    * per probeset, iteratively remove row (probe) and column (sample)
    * medians from the log-intensity matrix; the summarised expression
    * per (probeset, sample) is overall + column effect. Runs as
    * `groupByKey(probeset).mapGroups` — a probeset is ≤ ~70 probes ×
    * samples, so each group is tiny while probesets stay distributed.
    * Probes/samples are sorted before iteration for bit-reproducible
    * results. */
  def medianPolish(probes: ExpressionMatrix, annot: DataFrame,
      probeCol: String = "probe", probesetCol: String = "probeset",
      maxIter: Int = 10, tol: Double = 0.01): ExpressionMatrix = {
    val spark = probes.df.sparkSession
    import spark.implicits._
    val mapped = probes.canonical.df.join(broadcast(
        annot.select(col(probeCol).as("gene_id"), col(probesetCol).as("__ps"))),
      Seq("gene_id"))
      .select(col("__ps"), col("gene_id"), col("sample_id"), col("value"))
      .as[(String, String, String, Double)]
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    mapped.groupByKey(_._1).flatMapGroups { (ps, it) =>
      val cells = it.toArray
      val probeIds = cells.map(_._2).distinct.sorted
      val sampleIds = cells.map(_._3).distinct.sorted
      val pIdx = probeIds.zipWithIndex.toMap
      val sIdx = sampleIds.zipWithIndex.toMap
      val mat = Array.fill(probeIds.length, sampleIds.length)(Double.NaN)
      cells.foreach { case (_, p, s, v) => mat(pIdx(p))(sIdx(s)) = v }
      // missing cells -> column median of observed values (rare)
      for (j <- sampleIds.indices) {
        val obs = probeIds.indices.map(i => mat(i)(j)).filterNot(_.isNaN)
        val fill = if (obs.nonEmpty) median(obs.toArray) else 0.0
        for (i <- probeIds.indices if mat(i)(j).isNaN) mat(i)(j) = fill
      }
      var overall = 0.0
      val rowEff = Array.fill(probeIds.length)(0.0)
      val colEff = Array.fill(sampleIds.length)(0.0)
      var iter = 0
      var delta = Double.MaxValue
      while (iter < maxIter && delta > tol) {
        delta = 0.0
        for (i <- probeIds.indices) {
          val m = median(mat(i))
          rowEff(i) += m; delta += math.abs(m)
          for (j <- sampleIds.indices) mat(i)(j) -= m
        }
        val rm = median(rowEff.clone()); overall += rm; delta += math.abs(rm)
        for (i <- probeIds.indices) rowEff(i) -= rm
        for (j <- sampleIds.indices) {
          val cm = median(probeIds.indices.map(i => mat(i)(j)).toArray)
          colEff(j) += cm; delta += math.abs(cm)
          for (i <- probeIds.indices) mat(i)(j) -= cm
        }
        val cm2 = median(colEff.clone()); overall += cm2; delta += math.abs(cm2)
        for (j <- sampleIds.indices) colEff(j) -= cm2
        iter += 1
      }
      sampleIds.indices.iterator.map(j => (ps, sampleIds(j), overall + colEff(j)))
    }.toDF("gene_id", "sample_id", "value") match {
      case df => ExpressionMatrix(df)
    }
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
