package graft

import graft.operators.ProbeFilter
import org.apache.spark.sql.functions._

/** F3 threshold boundary cases vs ProbeFilter.pl semantics:
  * exon removes at >1 bad row (:153), 3'IVT at >2 (:440), Illumina at
  * >0 (:1386-1429); multi-gene probesets always removed (:126-128);
  * all-"-" probesets never reach the flat file. */
class ProbeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def annot(rows: (String, String, String, String, Int)*) =
    rows.toDF("probeset", "probe", "gene_id", "cigar", "gene_no")
      .withColumn("gene_short_name",
        when(col("gene_id") === "-", "-").otherwise(concat(lit("n_"), col("gene_id"))))

  // ps_ok: clean. ps_1bad: one mismatch row. ps_2bad: two bad rows
  // (one cigar, one gene_no). ps_3bad: three. ps_multi: two genes, no
  // bad cigars. ps_dash: only "-" rows. ps_mixdash: bad "-" rows must
  // not count against the kept gene rows.
  private val fixture = annot(
    ("ps_ok", "p1", "gA", "25=", 1), ("ps_ok", "p2", "gA", "25=", 1),
    ("ps_1bad", "p1", "gB", "24=1X", 1), ("ps_1bad", "p2", "gB", "25=", 1),
    ("ps_2bad", "p1", "gC", "24=1X", 1), ("ps_2bad", "p2", "gC", "25=", 2),
    ("ps_2bad", "p3", "gC", "25=", 1),
    ("ps_3bad", "p1", "gD", "24=1X", 1), ("ps_3bad", "p2", "gD", "12=1X12=", 1),
    ("ps_3bad", "p3", "gD", "25=", 0), ("ps_3bad", "p4", "gD", "25=", 1),
    ("ps_multi", "p1", "gE", "25=", 1), ("ps_multi", "p2", "gF", "25=", 1),
    ("ps_dash", "p1", "-", "25=", 0),
    ("ps_mixdash", "p1", "gG", "25=", 1), ("ps_mixdash", "p2", "-", "24=1X", 0))

  private def kept(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("probe").as[String].collect().toSet

  test("exon flat keeps <=1 bad row, removes multi-gene and all-dash") {
    assert(kept(ProbeFilter.exonFlat(fixture)) == Set("ps_ok", "ps_1bad", "ps_mixdash"))
  }

  test("3'IVT flat keeps <=2 bad rows") {
    assert(kept(ProbeFilter.ivtFlat(fixture)) ==
      Set("ps_ok", "ps_1bad", "ps_2bad", "ps_mixdash"))
  }

  test("Illumina flat removes any defect") {
    assert(kept(ProbeFilter.illuminaFlat(
      fixture.withColumn("cigar", when(col("cigar") === "25=", "50=").otherwise(col("cigar"))))) ==
      Set("ps_ok", "ps_mixdash"))
  }

  test("flat reports the probeset's unique gene annotation") {
    val row = ProbeFilter.exonFlat(fixture).filter(col("probe") === "ps_1bad").head()
    assert(row.getAs[String]("gene_idD") == "gB")
    assert(row.getAs[String]("gene_short_name") == "n_gB")
  }

  test("removal counts rows, not distinct probes (multi-mapping probe)") {
    // one probe mapping twice, both rows bad -> 2 bad rows -> exon removes
    val multiMap = annot(
      ("ps_mm", "p1", "gH", "24=1X", 1), ("ps_mm", "p1", "gH", "23=2X", 1),
      ("ps_mm", "p2", "gH", "25=", 1))
    assert(kept(ProbeFilter.exonFlat(multiMap)).isEmpty)
    assert(kept(ProbeFilter.ivtFlat(multiMap)) == Set("ps_mm"))
  }

  test("perProbesetSummary dedups probes and applies order-dependent gene-switch rule") {
    val ordered = annot(
      ("ps_s", "p1", "gA", "25=", 1),   // clean
      ("ps_s", "p2", "gA", "24=1X", 1), // bad cigar
      ("ps_s", "p2", "gA", "25=", 1),   // second mapping of p2: ignored
      ("ps_s", "p3", "gB", "25=", 1))   // gene switch vs last-seen gA
      .withColumn("ord", monotonically_increasing_id())
    val out = ProbeFilter.perProbesetSummary(
      ordered.repartition(1), "25=", col("ord")).head()
    assert(out.getAs[Long]("probes_number") == 3L)
    assert(out.getAs[Long]("unreliable_probes_number") == 2L)
  }

  test("summaryHistograms stacks both frequency tables") {
    val summary = Seq(("a", 4L, 0L), ("b", 4L, 1L), ("c", 3L, 1L))
      .toDF("probeset", "probes_number", "unreliable_probes_number")
    val hist = ProbeFilter.summaryHistograms(summary)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(hist == Set(
      ("probes_number", 4L, 2L), ("probes_number", 3L, 1L),
      ("unreliable_probes_number", 0L, 1L), ("unreliable_probes_number", 1L, 2L)))
  }
}
