package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F3 — probe-reliability filtering from Ensembl cigar-string mappings
  * (reference: scripts/microarray_data_processing/ProbeFilter.pl).
  *
  * The reference streams an `ArrayAnnot.pl` annotation file once per
  * platform and emits the `.flat` probe→gene relation that every
  * downstream platform chain consumes (the F2 reliable-probe semi-join
  * and J4 annotation joins read these flat files). Re-derived here as
  * a single `groupBy(probeset)` aggregation — one shuffle on the
  * probeset key, no sequential state.
  *
  * Removal rules (`ProbeFilter.pl:126-155` exon, `:410-440` 3'IVT,
  * `:1386-1429` Illumina), over annotation rows whose gene is not the
  * `"-"` placeholder:
  *   - a probeset whose rows map to more than one distinct gene is
  *     removed unconditionally (the Perl sentinel `Probes2rm = 10` at
  *     `:126-128` — 10 exceeds every platform threshold);
  *   - otherwise rows with an imperfect cigar or `gene_no != 1` are
  *     counted, and the probeset is removed when the count exceeds the
  *     platform threshold: >1 for exon arrays (perfect cigar `25=`,
  *     `:153`), >2 for 3' IVT arrays (`25=`, `:440`), >0 for Illumina
  *     (`50=`, `:1386-1429`, keyed by probe rather than probeset).
  *   - probesets with no non-`"-"` row never reach the flat file
  *     (the Perl `%Probes` hash is only populated from such rows).
  *
  * The Perl counts failing *rows* (multi-mapping probes contribute one
  * count per mapping), not distinct probes — reproduced here with a
  * plain `sum`, not a distinct count. The reported gene is the last
  * non-`"-"` row's in file order; for kept probesets the gene is
  * unique by construction, so `max` is equivalent and order-free.
  */
object ProbeFilter {

  /** The `.flat` relation: kept probesets with their gene annotation.
    * `annot` columns: probeset, gene_id, gene_short_name, cigar,
    * gene_no (probe-level rows; a `probe` column may be present but is
    * not consulted — removal counts rows, see object doc).
    * Output: (probe, gene_idD, gene_short_name) — the reference's flat
    * header (`ProbeFilter.pl:144`). */
  def flat(annot: DataFrame, perfectCigar: String, maxBad: Long): DataFrame =
    annot.filter(col("gene_id") =!= "-")
      .groupBy("probeset")
      .agg(
        countDistinct("gene_id").as("n_genes"),
        sum((col("cigar") =!= perfectCigar || col("gene_no") =!= 1).cast("long"))
          .as("bad_rows"),
        max("gene_id").as("gene_idD"),
        max("gene_short_name").as("gene_short_name"))
      .filter(col("n_genes") === 1 && col("bad_rows") <= maxBad)
      .select(col("probeset").as("probe"), col("gene_idD"), col("gene_short_name"))

  /** Affymetrix exon arrays (HuEx-1ST, HuGene-1ST): 25-mer probes,
    * remove at >1 unreliable row (`ProbeFilter.pl:153`). */
  def exonFlat(annot: DataFrame): DataFrame = flat(annot, "25=", maxBad = 1L)

  /** Affymetrix 3' IVT arrays (U133Plus2, U133A, U95 family): remove
    * at >2 unreliable rows (`ProbeFilter.pl:440`). */
  def ivtFlat(annot: DataFrame): DataFrame = flat(annot, "25=", maxBad = 2L)

  /** Illumina HT-12: 50-mer probes keyed by probe id (pass the probe
    * id as `probeset`), any defect removes (`ProbeFilter.pl:1386-1429`). */
  def illuminaFlat(annot: DataFrame): DataFrame = flat(annot, "50=", maxBad = 0L)

  /** The `.perProbeset_summary` relation: per probeset, the number of
    * distinct probes and of unreliable probes (`ProbeFilter.pl:163-190`).
    * Unlike removal counting this deduplicates on (probeset, probe)
    * keeping the FIRST occurrence in file order, includes `"-"` rows,
    * and flags a probe unreliable when its first-occurrence row has an
    * imperfect cigar / `gene_no != 1` or names a different gene than
    * the last non-`"-"` gene seen earlier in the probeset — an
    * order-dependent rule, so callers pass the file order as `ord`.
    * Two window shuffles (probeset; probeset+probe) on a
    * metadata-sized relation. */
  def perProbesetSummary(annot: DataFrame, perfectCigar: String, ord: Column): DataFrame = {
    val wSet = Window.partitionBy(col("probeset")).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wProbe = Window.partitionBy(col("probeset"), col("probe")).orderBy(ord)
    annot
      .withColumn("__prev_gene",
        last(when(col("gene_id") =!= "-", col("gene_id")), ignoreNulls = true).over(wSet))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") === 1)
      .withColumn("__unreliable",
        (col("cigar") =!= perfectCigar || col("gene_no") =!= 1) ||
          (col("__prev_gene").isNotNull && col("__prev_gene") =!= col("gene_id")))
      .groupBy("probeset")
      .agg(count(lit(1)).as("probes_number"),
        sum(col("__unreliable").cast("long")).as("unreliable_probes_number"))
  }

  /** The `.summary` histograms (`ProbeFilter.pl:196-216`): frequency of
    * probesets by probe count and by unreliable-probe count, stacked as
    * (metric, k, frequency). */
  def summaryHistograms(summary: DataFrame): DataFrame = {
    val byProbes = summary.groupBy(col("probes_number").as("k"))
      .agg(count(lit(1)).as("frequency"))
      .select(lit("probes_number").as("metric"), col("k"), col("frequency"))
    val byUnreliable = summary.groupBy(col("unreliable_probes_number").as("k"))
      .agg(count(lit(1)).as("frequency"))
      .select(lit("unreliable_probes_number").as("metric"), col("k"), col("frequency"))
    byProbes.unionByName(byUnreliable)
  }
}
