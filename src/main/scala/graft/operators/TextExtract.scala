package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Everything is regexp/string algebra in the Java∩RE2 dialect
  * (inline `(?is)` flags, non-greedy spans, no backreferences or
  * lookaround) so the extraction is oracle-checkable. Two forms share
  * one rule set: the line-relation form ([[htmlLines]] /
  * [[extractHtmlText]] — codegen'd, one doc-keyed shuffle) and the
  * stateless column form ([[extractHtmlTextCol]] — zero shuffle,
  * streaming-safe, interpreted lambdas).
  */
object TextExtract {

  /** Entity decode map; `&amp;` LAST so `&amp;lt;` decodes to the
    * literal `&lt;`, not `<`. */
  private val entities = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&copy;" -> "(c)", "&amp;" -> "&")

  /** Shared rule chain, part 1 — document-level: squeeze SOURCE
    * newlines/tabs to spaces FIRST (real crawl HTML is
    * pretty-printed; a tag broken across physical lines would
    * otherwise split mid-tag — markup leaking into text, anchors
    * uncounted — and one logical paragraph would fragment into short
    * lines that flip the boilerplate length verdict), then strip
    * head/script/style and convert block-closing tags to newlines.
    * Line structure comes ONLY from block tags. */
  private def blockLined(html: Column): Column = {
    val x0 = regexp_replace(html, "[\\n\\r\\t]+", " ")
    val x1 = regexp_replace(x0, "(?is)<head.*?</head>", " ")
    val x2 = regexp_replace(x1, "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    regexp_replace(x2, "(?is)</(p|div|h1|h2|h3|li|nav|footer|tr)>", "\n")
  }

  /** Shared rule chain, part 2 — per line: tag-strip, entity-decode,
    * whitespace-squeeze. */
  private def lineTxt(line: Column): Column = {
    val decoded = entities.foldLeft(regexp_replace(line, "<[^>]*>", " ")) {
      case (c, (e, r)) => regexp_replace(c, e, r)
    }
    regexp_replace(trim(decoded), "\\s+", " ")
  }

  /** Anchor count — measured on the MARKUP (the link text itself
    * survives the strip, which is why density is counted here);
    * \s>-class, not literal space: `<a\thref=…` is still an anchor. */
  private def lineLinks(line: Column): Column =
    regexp_count(line, lit("(?i)<a[\\s>]"))

  /** The boilerplate verdict: keep non-empty lines that are not
    * link-dense (≥ 2 anchors, or ≥ 1 anchor under 40 chars of text). */
  private def lineKeep(txt: Column, nLinks: Column): Column =
    (length(txt) > 0) && !(nLinks >= 2 || (nLinks >= 1 && length(txt) < 40))

  /** Line relation of an HTML corpus: (`id`, lpos, n_links, txt) —
    * txt is the tag-stripped, entity-decoded, whitespace-squeezed
    * line text; n_links counts anchors BEFORE stripping. */
  def htmlLines(docs: DataFrame, id: String = "doc_id",
      html: String = "html"): DataFrame = {
    val lines = docs.select(col(id),
      posexplode(split(blockLined(col(html)), "\n")).as(Seq("lpos", "line")))
    lines.select(col(id), col("lpos"),
      lineLinks(col("line")).cast("long").as("n_links"),
      lineTxt(col("line")).as("txt"))
  }

  /** Extracted document text + extraction stats: boilerplate lines
    * dropped by link density, empty lines ignored, survivors
    * re-joined in document order. Returns
    * (`id`, n_kept, n_dropped, n_links, text). */
  def extractHtmlText(docs: DataFrame, id: String = "doc_id",
      html: String = "html"): DataFrame = {
    val lines = htmlLines(docs, id, html)
      .withColumn("keep", lineKeep(col("txt"), col("n_links")))
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

  /** The extraction as ONE stateless column — zero shuffle, no
    * explode: the line relation folds into array algebra (split →
    * transform → array_join, which skips the dropped lines' nulls).
    * Semantics identical to [[extractHtmlText]]'s `text`
    * (spec-gated, same private rule chain). This is the STREAMING
    * form: a pure projection usable in any `withColumn` on a live
    * stream — no state, no watermark, no output-mode constraint.
    * Trade-off: the per-line lambdas run interpreted (outside
    * codegen) — for batch corpus work prefer [[extractHtmlText]],
    * whose line relation is codegen'd end to end at the cost of one
    * doc-keyed shuffle. */
  def extractHtmlTextCol(html: Column): Column = {
    val kept = transform(split(blockLined(html), "\n"), line => {
      val txt = lineTxt(line)
      when(lineKeep(txt, lineLinks(line)), txt)
    })
    array_join(kept, " ")
  }

  // -----------------------------------------------------------------
  // URL canonicalization — the OTHER raw-crawl front stage: a crawl
  // frontier reaches the same resource through syntactic URL variants
  // (scheme/host case, www., default ports, trailing slashes,
  // tracking parameters, parameter order, fragments), and URL-grain
  // dedup BEFORE fetch/extraction is the cheapest dedup a pipeline
  // has — it needs no content at all. Rules follow RFC 3986 §6
  // syntax-based normalization plus the standard tracking-parameter
  // strip.
  // -----------------------------------------------------------------

  /** Query parameters that identify a CAMPAIGN, not a resource. */
  private val trackingParamRe =
    "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref)(=|$)"

  /** Canonical form of a URL as ONE pure codegen-friendly column:
    * strip the fragment; lowercase scheme+authority (ONLY those —
    * path case is significant per RFC 3986); drop `www.`; drop
    * default ports (`:80` http, `:443` https); strip trailing path
    * slashes; drop tracking parameters and SORT the survivors (query
    * order is almost never semantic, and a canonical order is what
    * makes the string a dedup key). A scheme-less/relative input
    * degenerates gracefully (empty authority, same path/query
    * rules). */
  def canonicalizeUrl(url: Column): Column = {
    val u0 = regexp_replace(trim(url), "#.*$", "")
    val auth0 = regexp_extract(u0, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val rest = u0.substr(length(auth0) + lit(1), length(u0))
    val auth = regexp_replace(
      regexp_replace(
        regexp_replace(lower(auth0), "://www\\.", "://"),
        "^(http://[^/:?#]+):80$", "$1"),
      "^(https://[^/:?#]+):443$", "$1")
    val qpos = instr(rest, "?")
    val path = regexp_replace(
      when(qpos > 0, rest.substr(lit(1), qpos - 1)).otherwise(rest),
      "/+$", "")
    val query = when(qpos > 0, rest.substr(qpos + 1, length(rest))).otherwise(lit(""))
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingParamRe))
    val canonQ = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&"))).otherwise(lit(""))
    concat(auth, path, canonQ)
  }

  /** URL-grain dedup: keep the lowest id per CANONICAL url — the
    * [[TextDedup.exactDedup]] min_by keep-first convention (partial-
    * aggregatable; a viral URL never becomes a single-task sort),
    * keyed on [[canonicalizeUrl]] instead of the content
    * fingerprint. Returns the input columns plus `canon_url`. */
  def urlDedup(docs: DataFrame, url: String = "url",
      id: String = "doc_id"): DataFrame = {
    val canon = docs.withColumn("canon_url", canonicalizeUrl(col(url)))
    canon.groupBy(col("canon_url"))
      .agg(min_by(struct(canon.columns.map(col): _*), col(id)).as("__w"))
      .select(col("__w.*"))
  }
}
