package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data
  * pipelines: tokenization, shingling, MinHash, SimHash, language-ID
  * scoring, quality scoring, fingerprinting.
  *
  * Everything here is composed from `org.apache.spark.sql.functions`
  * (codegen'd, no UDFs) so whole-stage codegen spans the full text
  * pipeline — this is the difference between streaming 100 TB of
  * documents through one generated loop and breaking the stage per
  * document function.
  *
  * Two hash families are provided:
  *  - `xxhash64`-based (default): fast 64-bit hashes for production;
  *  - `md5`-based: slower, but bit-identical across engines (used by
  *    the oracle-checked queries, since DuckDB shares md5 semantics).
  */
object TextFunctions {

  /** Evaluate-once binding for a shared subexpression (round 17):
    * `bindOne(e)(f)` computes `f` over `e` with `e` bound to a lambda
    * variable of a single-element `transform`, so however many times
    * `f`'s body references it, `e` is EVALUATED ONCE per row — and,
    * because the optimizer cannot substitute through a lambda
    * binding, predicate pushdown / projection collapse cannot
    * re-duplicate it either. Before this, the q65 physical plan
    * carried 35 copies of the `split(lower(text))` tokenizer: every
    * alias substitution (langId's 4 language scores × the tie-break
    * re-evaluation, qualityScore's 5 token references) re-inlined the
    * full tokenize per reference. Value-identical by construction:
    * the lambda body is the same expression tree over the same input.
    * Null semantics match inlining: `array(e)` is never null, the
    * lambda sees e's (possibly null) value exactly as the inline
    * expression would. */
  private[graft] def bindOne(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), f), 1)

  /** Lowercase word tokens: split on runs of non-alphanumerics. */
  def tokens(text: Column): Column =
    array_remove(split(lower(text), "[^a-z0-9]+"), "")

  /** Whitespace token count (the cheap token counter). */
  def wsTokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alphanumeric runs count one per ceil(len/4)
    * plus one per non-space symbol — a deterministic proxy for BPE
    * token counts without a vocabulary. */
  def bpeishTokenCount(text: Column): Column = {
    // tokens() bound once (bind1): the word-piece aggregate is the
    // only consumer here, but callers compose this next to langId /
    // qualityScore in one projection and alias substitution used to
    // re-inline the tokenizer per reference
    val wordPieces = bindOne(tokens(text))(words => aggregate(
      transform(words, w => ceil(length(w) / lit(4.0)).cast("long")),
      lit(0L), (acc, x) => acc + x))
    val symbols = length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))
    wordPieces + symbols
  }

  /** w-word shingles joined by a single space. */
  def shingles(toks: Column, w: Int): Column =
    when(size(toks) >= w,
      transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", slice(toks, i + 1, lit(w)))))
      .otherwise(array(concat_ws(" ", toks)))

  /** MinHash signature: k minima of per-seed hashes over the shingle
    * set. Seeded by prefixing the shingle; production path uses
    * xxhash64. Returns array<string|long> of length k. */
  def minhashXx(shingleSet: Column, k: Int): Column =
    array((0 until k).map(seed =>
      array_min(transform(shingleSet, s => xxhash64(lit(seed), s)))): _*)

  /** MinHash with md5 (engine-portable: min of hex digests as strings). */
  def minhashMd5(shingleSet: Column, k: Int): Column =
    array((0 until k).map(seed =>
      array_min(transform(shingleSet, s => md5(concat(lit(seed + "|"), s))))): _*)

  /** LSH band keys from a signature: `nBands` groups of `rowsPerBand`
    * consecutive signature entries hashed together; pairs sharing any
    * band key are candidate duplicates. */
  def lshBands(signature: Column, nBands: Int, rowsPerBand: Int): Column =
    array((0 until nBands).map(b =>
      concat_ws("#", lit(b.toString) +:
        (0 until rowsPerBand).map(r => signature(b * rowsPerBand + r).cast("string")): _*)): _*)

  /** 32-bit SimHash from md5 bit votes: ONE digest per token, bit i's
    * ±1 vote from the sign of the digest's i-th hex character
    * (< '8' ⇔ high bit clear). Portable across engines and 32× fewer
    * digests than hashing per (token, bit). */
  def simhashMd5(toks: Column, bits: Int = 32): Column = {
    require(bits <= 32, "md5 provides 32 hex chars = 32 votes")
    // one digest pass, bound once: the 32 per-bit votes used to each
    // re-evaluate transform(toks, md5) — 32 digests per token per row
    bindOne(transform(toks, t => md5(t))) { hs =>
      val votes = (0 until bits).map { i =>
        val vote = aggregate(hs, lit(0),
          (acc, h) => acc + when(substring(h, i + 1, 1) < "8", 1).otherwise(-1))
        when(vote > 0, lit(1L << i)).otherwise(lit(0L))
      }
      votes.reduce(_ + _)
    }
  }

  /** 64-bit SimHash, production path: one xxhash64 per token, bit i of
    * the hash is the vote. */
  def simhashXx(toks: Column): Column = {
    // vote per bit from the token hash's own bit: sum_t (2*bit_i(h_t)-1);
    // hashes computed once and bound (64 votes used to re-hash per bit)
    bindOne(transform(toks, t => xxhash64(t))) { hs =>
      val perBit = (0 until 64).map { i =>
        val v = aggregate(hs, lit(0),
          (acc, h) => acc + (shiftright(h, i).bitwiseAND(lit(1L)) * 2 - 1).cast("int"))
        when(v > 0, lit(1L << i)).otherwise(lit(0L))
      }
      perBit.reduce(_ + _)
    }
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Stopword-count language scores. Tiny fixed stoplists — the
    * deterministic n-gram/stopword heuristic of the survey brief. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "en", "por"))

  def langScore(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(stopwords(lang).map(lit(_)): _*)))

  /** Predicted language: argmax of stopword scores with deterministic
    * tie-break on language code; "und" (undetermined) when all zero. */
  def langId(toks: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    // toks bound once (4 language scores each referenced it), and the
    // winning struct bound once (the zero-score test re-evaluated the
    // whole argmax before) — one tokenize, 4 stoplist passes, period
    bindOne(toks) { t =>
      val scored = langs.map(l => struct(langScore(t, l).as("score"), lit(l).as("lang")))
      val best = array_max(array(scored.map(s =>
        struct(s.getField("score").as("score"),
          // invert lang code ordering so max prefers the alphabetically
          // first language on score ties
          s.getField("lang").as("lang"))): _*))
      bindOne(best)(b =>
        when(b.getField("score") === 0, lit("und")).otherwise(b.getField("lang")))
    }
  }

  /** Document quality score in [0,1]: blend of length, punctuation
    * ratio, stopword ratio, and mean word length — the survey's
    * length/punct/stopword heuristic. */
  def qualityScore(text: Column): Column = bindOne(tokens(text)) { toks =>
    // tokens bound once — the length / word-length / stopword terms
    // each referenced it, so alias substitution used to inline 5
    // tokenizer copies per evaluation site
    val nTok = size(toks).cast("double")
    val meanWordLen = when(nTok > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTok).otherwise(0.0)
    val punct = length(regexp_replace(text, "[^.,!?;:]", "")).cast("double")
    val punctRatio = when(length(text) > 0, punct / length(text)).otherwise(0.0)
    val allStop = stopwords.values.flatten.toSeq.distinct
    val stopRatio = when(nTok > 0,
      size(filter(toks, t => t.isin(allStop.map(lit(_)): _*))).cast("double") / nTok)
      .otherwise(0.0)
    val lenScore = least(lit(1.0), nTok / 100.0)
    val wordLenScore = lit(1.0) - least(lit(1.0), abs(meanWordLen - 5.0) / 5.0)
    val punctScore = lit(1.0) - least(lit(1.0), punctRatio * 10.0)
    val stopScore = least(lit(1.0), stopRatio * 3.0)
    lenScore * 0.3 + wordLenScore * 0.3 + punctScore * 0.2 + stopScore * 0.2
  }

  /** The one [[TextKernels.deflateRatio]] `StaticInvoke` spec —
    * shared by the Column API below and the SQL registration in
    * [[graft.GraftExtensions]] so the two surfaces cannot drift. */
  def compressionRatioExpr(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      TextKernels.getClass, org.apache.spark.sql.types.DoubleType,
      "deflateRatio", Seq(e), Seq(org.apache.spark.sql.types.StringType),
      propagateNull = true, returnNullable = false)

  /** Compression-ratio quality signal: zlib-compressed bytes / raw
    * bytes ([[TextKernels.deflateRatio]] as a codegen `StaticInvoke`
    * — no UDF closure). Low values flag repetitive boilerplate and
    * templated spam; pair with [[qualityScore]] as an independent
    * axis. Spec-gated (SQL engines ship no deflate — no oracle). */
  def compressionRatio(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      compressionRatioExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** Content fingerprint: md5 of the normalised token stream —
    * whitespace/punctuation-insensitive exact-dup key. */
  def fingerprint(text: Column): Column = md5(concat_ws(" ", tokens(text)))

  /** [[TextKernels.maskSpans]] as a codegen `StaticInvoke` (the
    * deflateRatio convention): rebuild the cleaned token stream with
    * every position covered by a [start, start+n-1] span dropped —
    * the array-local half of TextDedup.removeRepeatedSpans. */
  def maskSpansOf(toks: Column, starts: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types._
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        TextKernels.getClass, StringType, "maskSpans",
        Seq(ColumnBridge.expression(toks), ColumnBridge.expression(starts),
          org.apache.spark.sql.catalyst.expressions.Literal(n)),
        Seq(ArrayType(StringType), ArrayType(IntegerType), IntegerType),
        propagateNull = true, returnNullable = false))
  }

  /** [[TextKernels.coveredCount]] as a codegen `StaticInvoke`: how
    * many of the first `nTokens` positions the span union covers. */
  def coveredCountOf(nTokens: Column, starts: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types._
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        TextKernels.getClass, IntegerType, "coveredCount",
        Seq(ColumnBridge.expression(nTokens), ColumnBridge.expression(starts),
          org.apache.spark.sql.catalyst.expressions.Literal(n)),
        Seq(IntegerType, ArrayType(IntegerType), IntegerType),
        propagateNull = true, returnNullable = false))
  }

  /** PII patterns for corpus scrubbing. Deliberately simple regexes
    * that mean the same thing to Java regex (Spark codegen) and RE2
    * (DuckDB), so the scrub is oracle-checkable: emails, and
    * international-ish phone numbers (leading + optional, ≥ 9 chars
    * of digits/space/()-, digit at both ends). */
  val emailPattern: String = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val phonePattern: String = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  /** Count of email / phone matches in a document. */
  def piiEmailCount(text: Column): Column = regexp_count(text, lit(emailPattern))
  def piiPhoneCount(text: Column): Column = regexp_count(text, lit(phonePattern))

  /** Masked text: emails → `<EMAIL>`, then phones → `<PHONE>` (email
    * first so local parts containing digits can't half-match as
    * phones). Pure codegen regexp_replace — the scrub streams. */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")
}
