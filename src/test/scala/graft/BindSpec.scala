package graft

import graft.model.ExpressionMatrix
import graft.operators.{Bind, DiffExpr}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** J6/J7 contract freeze: golden TSV write + positional read-back of
  * the annotated topTable (columns 8/11 are what Meta_analysis.R:
  * 1082-1087 and Bind_Meta2DElists.pl:218 consume), and the
  * known/exclude/mark semantics of Bind_Meta2DElists. */
class BindSpec extends SparkSpec {
  import spark.implicits._

  private def smallTopTable() = {
    val rows = for (g <- Seq("gA", "gB", "gC"); s <- 1 to 6) yield {
      val grp = if (s <= 3) "A" else "B"
      val eff = if (g == "gA" && grp == "A") 4.0 else 0.0
      (g, s"s$s", 10.0 + eff + (s % 3) * 0.7 + (g.hashCode % 5) * 0.1, grp)
    }
    val m = ExpressionMatrix(rows.map(r => (r._1, r._2, r._3)).toDF("gene_id", "sample_id", "value"))
    val groups = rows.map(r => (r._2, r._4)).distinct.toDF("sample_id", "group")
    DiffExpr.topTable(DiffExpr.welchT(DiffExpr.groupStats(m, groups), "group", "A", "B"))
  }

  private val annot = Seq(
    ("gA", "SYMA", "gene A desc", "1", "q21", 1, 100L, 200L),
    ("gB", "SYMB", "gene B desc", "X", "p11", -1, 300L, 400L))
    .toDF("gene_id", "hgnc_symbol", "description", "chromosome_name",
      "band", "strand", "start_position", "end_position")

  test("annotated topTable golden TSV: positional col-8 log2FC / col-11 adj p, NA rows") {
    val tt = Bind.annotatedTopTable(smallTopTable(), annot)
    // frozen column order
    assert(tt.columns.toSeq == Seq("gene") ++ Bind.annotationCols ++ Bind.statCols)
    val dir = Files.createTempDirectory("graft_bind").toString
    tt.orderBy(col("p_value").asc, col("gene").asc).coalesce(1)
      .write.option("sep", "\t").option("header", "true").option("nullValue", "NA")
      .mode("overwrite").csv(dir)
    val part = Files.list(Paths.get(dir)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".csv")).get
    val lines = Files.readAllLines(part).asScala
    val header = lines.head.split("\t")
    assert(header(0) == "gene" && header(8) == "log2FC" && header(11) == "adj_p_value")
    val byGene = lines.tail.map(_.split("\t", -1)).map(p => p(0) -> p).toMap
    // gA: annotated, strong effect — log2FC at position 8 parses and is ~4
    assert(math.abs(byGene("gA")(8).toDouble - 4.0) < 1.0)
    assert(byGene("gA")(1) == "SYMA" && byGene("gA")(7) == "200")
    // gC: unannotated — NA in every annotation position, stats intact
    assert((1 to 7).forall(i => byGene("gC")(i) == "NA"))
    assert(byGene("gC")(11).toDouble <= 1.0)
  }

  test("bindMetaToDE: per-study NA fill, known tag, mark prefix, exclude routing") {
    val meta = Seq(("gA", 3.2), ("gB", -1.1), ("gC", 0.4), ("gD", 2.2))
      .toDF("gene_id", "z_comb")
    val study1 = Seq(("gA", 1.5, 0.01), ("gB", -0.5, 0.2))
      .toDF("gene_id", "log2FC", "adj_p_value")
    val study2 = Seq(("gA", 1.1, 0.05), ("gC", 0.2, 0.9))
      .toDF("gene_id", "log2FC", "adj_p_value")
    val (bound, excluded) = Bind.bindMetaToDE(meta,
      Seq("s1" -> study1, "s2" -> study2),
      known = Some(Seq("gA").toDF("gene_id")),
      exclude = Some(Seq("gD").toDF("gene_id")),
      marks = Some(Seq(("gB", "*")).toDF("gene_id", "mark")))
    val rows = bound.collect().map(r => r.getAs[String]("gene_id") -> r).toMap
    assert(rows.keySet == Set("gA", "*_gB", "gC"))
    assert(rows("gA").getAs[String]("known") == "yes")
    assert(rows("gC").getAs[String]("known") == "No")
    // study coverage: gC missing from s1 -> null pair (the NA fill)
    assert(rows("gC").isNullAt(rows("gC").fieldIndex("s1_log2FC")))
    assert(rows("gC").getAs[Double]("s2_adj_p") == 0.9)
    // excluded rows reported separately with the same schema
    val ex = excluded.collect()
    assert(ex.length == 1 && ex.head.getAs[String]("gene_id") == "gD")
    assert(bound.columns.toSeq == ex.head.schema.fieldNames.toSeq)
  }
}
