package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTML → text extraction — the raw-crawl front stage of a training
  * -data pipeline (the trafilatura/jusText role, reduced to
  * deterministic rules): strip metadata (`<head>`) and code
  * (`<script>`/`<style>`), recover line structure from block-closing
  * tags, strip remaining markup, decode entities, and drop
  * boilerplate lines by LINK DENSITY — navigation, ads and footers
  * are link-dense and short, content is not (the core of the jusText
  * heuristic).
  *
  * Everything is codegen'd regexp/string algebra in the Java∩RE2
  * dialect (inline `(?is)` flags, non-greedy spans, no
  * backreferences or lookaround) so the extraction is
  * oracle-checkable and streams at scan speed; the only shuffle is
  * the per-document line reassembly, keyed on the document id.
  */
object TextExtract {

  /** Entity decode map; `&amp;` LAST so `&amp;lt;` decodes to the
    * literal `&lt;`, not `<`. */
  private val entities = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&copy;" -> "(c)", "&amp;" -> "&")

  /** Line relation of an HTML corpus: (`id`, lpos, n_links, txt) —
    * txt is the tag-stripped, entity-decoded, whitespace-squeezed
    * line text; n_links counts anchors BEFORE stripping (the link
    * text itself survives the strip, which is exactly why link
    * density is measured on markup). */
  def htmlLines(docs: DataFrame, id: String = "doc_id",
      html: String = "html"): DataFrame = {
    // squeeze SOURCE newlines/tabs to spaces FIRST: real crawl HTML is
    // pretty-printed, and a tag broken across physical lines would
    // otherwise split mid-tag (markup leaking into text, anchors
    // uncounted) and fragment one logical paragraph into several short
    // lines that flip the boilerplate length verdict — line structure
    // comes ONLY from block-closing tags
    val x0 = regexp_replace(col(html), "[\\n\\r\\t]+", " ")
    val x1 = regexp_replace(x0, "(?is)<head.*?</head>", " ")
    val x2 = regexp_replace(x1, "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val x3 = regexp_replace(x2, "(?is)</(p|div|h1|h2|h3|li|nav|footer|tr)>", "\n")
    val lines = docs.select(col(id),
      posexplode(split(x3, "\n")).as(Seq("lpos", "line")))
    val decoded = entities.foldLeft(
      regexp_replace(col("line"), "<[^>]*>", " ")) {
      case (c, (e, r)) => regexp_replace(c, e, r)
    }
    lines.select(col(id), col("lpos"),
      // \s>-class, not literal-space: '<a\thref=...' is still an anchor
      regexp_count(col("line"), lit("(?i)<a[\\s>]")).cast("long").as("n_links"),
      regexp_replace(trim(decoded), "\\s+", " ").as("txt"))
  }

  /** Extracted document text + extraction stats: boilerplate lines
    * dropped by link density (≥ 2 anchors, or ≥ 1 anchor on a line
    * under 40 chars of text), empty lines ignored, survivors
    * re-joined in document order. Returns
    * (`id`, n_kept, n_dropped, n_links, text). */
  def extractHtmlText(docs: DataFrame, id: String = "doc_id",
      html: String = "html"): DataFrame = {
    val lines = htmlLines(docs, id, html)
      .withColumn("keep", (length(col("txt")) > 0) &&
        !(col("n_links") >= 2 || (col("n_links") >= 1 && length(col("txt")) < 40)))
    lines.groupBy(col(id))
      .agg(
        sum(col("keep").cast("long")).as("n_kept"),
        sum((!col("keep") && length(col("txt")) > 0).cast("long")).as("n_dropped"),
        sum(col("n_links")).as("n_links"),
        // collect_list skips the CASE's nulls, so only kept lines
        // reassemble; array_sort on (lpos, txt) restores doc order
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN keep THEN struct(lpos, txt) END)), x -> x.txt)"),
          " ").as("text"))
  }
}
