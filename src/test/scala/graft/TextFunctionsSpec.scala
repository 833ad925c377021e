package graft

import graft.functions.TextFunctions
import graft.operators.{TextDedup, TextRetrieval}
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {

  test("rateThresholds: /4096 quantization, zero padding, keep-all for rate >= 1") {
    import spark.implicits._
    val w = Seq(("a", 0.25), ("b", 1.0), ("c", 0.001), ("d", 0.999999))
      .toDF("key", "rate")
    val thr = TextDedup.rateThresholds(w, "key").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(thr("a") == "400", thr("a"))            // 0.25*4096 = 1024 = 0x400
    assert(thr("b") == null)                       // keep-all
    assert(thr("c") == "004", thr("c"))            // floor(4.096) = 4, zero-padded
    assert(thr("d") == "fff", thr("d"))            // floor(4095.99) = 4095
  }

  test("shardManifest: stitched ranks match the single-window reference, shards sized") {
    import spark.implicits._
    val docs = (0L until 333L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .repartition(7) // stitch must be partitioning-independent
    val m = TextDedup.shardManifest(docs, docsPerShard = 50L, seed = 4, md5Hashes = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(m.map(_._2).sorted.toSeq == (0L until 333L), "ranks dense from 0")
    // reference: one global sort by the same seeded hash
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md.digest(s"4#$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expect = (0L until 333L).sortBy(i => (h(i), i)).zipWithIndex
      .map { case (id, r) => id -> r.toLong }.toMap
    m.foreach { case (id, rank, shard, pos) =>
      assert(rank == expect(id), s"doc $id: rank $rank vs ${expect(id)}")
      assert(shard == rank / 50 && pos == rank % 50)
    }
    val sizes = m.groupBy(_._3).view.mapValues(_.length).toMap
    assert((0L to 5L).forall(sizes(_) == 50) && sizes(6L) == 33, s"sizes: $sizes")
  }

  test("mixtureWeights: alpha=1 keeps shares, alpha=0 flattens, budgets/rates bounded") {
    import spark.implicits._
    val docs = Seq.tabulate(100)(i =>
      (i.toLong, s"k${i % 4}", (i % 4 + 1) * 10L)).toDF("doc_id", "key", "toks")
    def run(alpha: Double) =
      TextDedup.mixtureWeights(docs, "key", "toks", alpha, totalBudget = 1000L)
        .collect().map(r => r.getAs[String]("key") ->
          ((r.getAs[Long]("toks"), r.getAs[Double]("share"), r.getAs[Double]("weight"),
            r.getAs[Long]("budget_toks"), r.getAs[Double]("rate")))).toMap
    val a1 = run(1.0)
    a1.values.foreach { case (_, share, weight, _, _) =>
      assert(math.abs(share - weight) < 2e-6, s"alpha=1: $share vs $weight") }
    val a0 = run(0.0)
    a0.values.foreach { case (_, _, weight, budget, _) =>
      assert(math.abs(weight - 0.25) < 2e-6 && budget == 250L, s"alpha=0: $weight $budget") }
    val mid = run(0.5)
    // flattening is monotone: the heaviest key loses weight vs its
    // share, the lightest gains; budgets track weights; rates <= 1
    assert(mid("k3")._3 < mid("k3")._2 && mid("k0")._3 > mid("k0")._2)
    assert(math.abs(mid.values.map(_._4).sum - 1000L) <= 4, s"budget sum: ${mid.values.map(_._4).sum}")
    mid.values.foreach { case (toks, _, _, budget, rate) =>
      assert(rate <= 1.0 && rate >= 0.0)
      assert(math.abs(rate - math.min(1.0, budget.toDouble / toks)) < 2e-6) }
  }

  test("bm25TopK: hand-computed scores, tf saturation, length normalization, tie-breaks") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join spark"),                    // tf(spark)=2, dl=3
      (2L, "spark filter merge"),                  // tf(spark)=1, dl=3
      (3L, "spark spark spark spark spark spark"), // tf=6 but dl=6
      (4L, "window sort agg")).toDF("doc_id", "text")
    val queries = Seq((1L, "spark"), (2L, "spark"), (2L, "window")).toDF("query_id", "term")
    val out = TextRetrieval.bm25TopK(docs, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // independent replay of the formula with plain doubles
    val n = 4.0; val avgdl = (3 + 3 + 6 + 3) / 4.0; val k1 = 1.2; val b = 0.75
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, df: Double, dl: Double) =
      idf(df) * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    def r6(x: Double) = math.round((x + 1e-9) * 1e6) / 1e6
    val q1 = out.filter(_._1 == 1L).sortBy(_._4)
    assert(q1.map(_._2).toSeq == Seq(3L, 1L, 2L), s"q1 ranking: ${q1.toSeq}")
    assert(q1.map(_._3).toSeq == Seq(r6(w(6, 3, 6)), r6(w(2, 3, 3)), r6(w(1, 3, 3))),
      s"q1 scores: ${q1.toSeq}")
    // multi-term query: doc 4 scores only on `window` (df=1, high idf)
    val q2 = out.filter(_._1 == 2L).sortBy(_._4)
    assert(q2.head._2 == 4L && r6(w(1, 1, 3)) == q2.head._3, s"q2: ${q2.toSeq}")
    assert(q2.map(_._2).toSeq == Seq(4L, 3L, 1L), s"q2 ranking: ${q2.toSeq}")
  }

  test("paragraphDedup keeps first occurrence, reassembles order, empties survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha\nshared one\nbeta"),
      (2L, "shared one\ngamma\nshared two"),
      (3L, "shared one\nshared two"),
      (4L, "alpha")).toDF("doc_id", "text")
    val out = TextDedup.paragraphDedup(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 owns alpha + "shared one" (first by doc_id); doc 2 keeps
    // gamma + first "shared two"; doc 3 loses everything; doc 4 loses
    // alpha to doc 1 and survives empty
    assert(out(1L) == "alpha\nshared one\nbeta", out(1L))
    assert(out(2L) == "gamma\nshared two", out(2L))
    assert(out(3L) == "", out(3L))
    assert(out(4L) == "", out(4L))
    // a doc repeating its own paragraph keeps only the first copy
    val self = Seq((9L, "x\nx\ny")).toDF("doc_id", "text")
    val o2 = TextDedup.paragraphDedup(self).collect().head.getString(1)
    assert(o2 == "x\ny", o2)
  }

  test("compressionRatio separates boilerplate from varied prose, codegen-safe") {
    import spark.implicits._
    val docs = Seq(
      (1L, "buy now " * 300),
      (2L, "the committee reviewed seventeen distinct proposals regarding " +
        "watershed management, alpine reforestation, and municipal zoning " +
        "variances before adjourning without a quorum decision"),
      (3L, "")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TextFunctions.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) < 0.1, s"repetitive text must compress hard, got ${out(1L)}")
    assert(out(2L) > out(1L) * 3, s"varied prose must sit well above boilerplate")
    assert(out(3L) == 1.0, "empty text is 1.0 by convention")
    // deterministic across evaluations (plan re-run)
    val again = docs.select(TextFunctions.compressionRatio(col("text")))
      .collect().map(_.getDouble(0)).sorted.toSeq
    assert(again == out.values.toSeq.sorted)
  }

  test("removeRepeatedSpans masks cross-document spans, keeps short docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon unique tail one"),
      (2L, "intro words alpha beta gamma delta epsilon other end"),
      (3L, "totally different content here okay"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val out = TextDedup.removeRepeatedSpans(docs, n = 5, minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // the one shared 5-token span is masked in BOTH documents (the
    // mask-all policy), and only its covered tokens go
    assert(out(1L) == (("unique tail one", 3L, 5L)), out(1L))
    assert(out(2L) == (("intro words other end", 4L, 5L)), out(2L))
    // untouched and too-short documents survive whole
    assert(out(3L) == (("totally different content here okay", 5L, 0L)), out(3L))
    assert(out(4L) == (("tiny doc", 2L, 0L)), out(4L))
  }
  import spark.implicits._

  test("tokens lowercases and splits on non-alphanumerics") {
    val out = Seq("Hello, World!  foo_bar 42").toDF("text")
      .select(TextFunctions.tokens(col("text"))).as[Seq[String]].head()
    assert(out == Seq("hello", "world", "foo", "bar", "42"))
  }

  test("shingles produce n-w+1 overlapping windows") {
    val out = Seq("a b c d").toDF("text")
      .select(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3))
      .as[Seq[String]].head()
    assert(out == Seq("a b c", "b c d"))
  }

  test("exactDedup keeps the lowest id per normalized content") {
    val docs = Seq(
      (1L, "Hello world"), (2L, "hello, WORLD!"), (3L, "something else"))
      .toDF("doc_id", "text")
    val kept = TextDedup.exactDedup(docs).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("minhashLshPairs finds a near-duplicate and scores jaccard") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 28).map(i => s"w$i").mkString(" ") + " x y"
    val unrelated = (100 to 130).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = TextDedup.minhashLshPairs(docs, k = 8, bands = 4, minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 2L && j > 0.5 })
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L })
  }

  test("capShingleDf drops viral shingles and bounds the candidate pair space") {
    // Adversarial fixture: every doc shares one boilerplate phrase, so
    // the uncapped shingle self-join emits a full n² pair block on it.
    val n = 20
    val docs = (1 to n).map(i =>
      (i.toLong, s"common boiler plate unique$i token$i word$i extra$i")).toDF("doc_id", "text")
    val sh = TextDedup.shingleRows(docs, 3)
    val hot = TextDedup.capShingleDf(sh, cap = 5)
    // the df=n shingle "common boiler plate" must be gone
    assert(hot.filter(col("s") === "common boiler plate").count() == 0)
    // per-doc unique shingles (df=1) survive
    assert(hot.filter(col("s") === s"unique7 token7 word7").count() == 1)
    // pair join on the capped relation yields zero candidate rows
    val pairs = hot.select(col("doc_id").as("id_a"), col("s"))
      .join(hot.select(col("doc_id").as("id_b"), col("s")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
    assert(pairs.count() == 0)
    // cap above max df is the identity
    assert(TextDedup.capShingleDf(sh, cap = 100).count() == sh.count())
  }

  test("simhash of identical token streams is identical; hamming 0") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "ALPHA beta!! gamma delta"),
      (3L, "wholly different content here")).toDF("doc_id", "text")
    val pairs = TextDedup.simhashPairs(docs, maxHamming = 0).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      "the cat sat of the mat and it is that",
      "der hund ist nicht auf der mit und das",
      "xyzzy qwerty plugh").toDF("text")
    val out = df.select(TextFunctions.langId(TextFunctions.tokens(col("text"))))
      .as[String].collect()
    assert(out(0) == "en" && out(1) == "de" && out(2) == "und")
  }

  test("fingerprint is whitespace/punctuation insensitive") {
    val fp = Seq("a b  c", "A,b.C").toDF("text")
      .select(TextFunctions.fingerprint(col("text"))).as[String].collect()
    assert(fp(0) == fp(1))
  }

  test("piiScrub masks emails and phones, counts match") {
    val df = Seq(
      "mail me at jane.doe+x@sub.example.org or call +1 (415) 555-2671 today",
      "no pii here at all").toDF("text")
      .select(TextFunctions.piiEmailCount(col("text")).as("e"),
        TextFunctions.piiPhoneCount(col("text")).as("p"),
        TextFunctions.piiScrub(col("text")).as("s"))
      .collect()
    assert(df(0).getAs[Int]("e") == 1 && df(0).getAs[Int]("p") == 1)
    val scrubbed = df(0).getAs[String]("s")
    assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<PHONE>"))
    assert(!scrubbed.contains("example.org") && !scrubbed.contains("555"))
    assert(df(1).getAs[Int]("e") == 0 && df(1).getAs[Int]("p") == 0)
    assert(df(1).getAs[String]("s") == "no pii here at all")
  }

  test("repetitionStats: repeated 2-grams dominate a degenerate doc") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"),          // one 2-gram repeated 4x
      (2L, "the quick brown fox jumps high")     // all 2-grams unique
    ).toDF("doc_id", "text")
    val out = TextDedup.repetitionStats(docs, n = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) == ((4L, 1.0, 1.0)))
    val (n2, top2, dup2) = out(2L)
    assert(n2 == 5L && math.abs(top2 - 0.2) < 1e-12 && dup2 == 0.0)
  }

  test("contaminationOverlap finds shared n-grams against a benchmark") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),    // shares a 3-gram run
      (2L, "zeta eta theta iota kappa")          // disjoint
    ).toDF("doc_id", "text")
    val bench = Seq((99L, "intro alpha beta gamma delta outro"))
      .toDF("doc_id", "text")
    val out = TextDedup.contaminationOverlap(docs, bench, n = 3).collect()
    assert(out.length == 1)
    val r = out.head
    // doc 1 has 3 distinct 3-grams; "alpha beta gamma" and
    // "beta gamma delta" collide with the benchmark
    assert(r.getLong(0) == 1L && r.getLong(1) == 3L && r.getLong(2) == 2L)
  }

  test("dsirSelect: target-like docs outweigh raw-only docs; exactly k selected") {
    // target docs (even ids) repeat a distinctive vocabulary; raw-only
    // docs (odd ids) use disjoint tokens. A raw doc written in the
    // target vocabulary must score above every raw-only doc — the
    // importance weight tracks feature-distribution similarity, not
    // the target flag itself.
    val docs = ((0L until 40L).map { i =>
      val txt = if (i % 2 == 0) "quantum entangled qubit lattice coherence decoherence"
      else "gravel asphalt pothole drainage culvert roadside"
      (i, txt)
    } :+ (100L, "quantum qubit coherence lattice entangled decoherence"))
      .toDF("doc_id", "text")
    val out = TextRetrieval.dsirSelect(docs, col("doc_id") % 2 === 0 && col("doc_id") < 50L,
        k = 5, hexChars = 2)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("weight"), r.getAs[Boolean]("selected")))).toMap
    assert(out.size == 41, "every input doc must score")
    assert(out.count(_._2._2) == 5, s"expected exactly k=5 selected")
    val targetLike = out(100L)._1
    val rawOnly = out.filter(k => k._1 % 2 == 1 && k._1 < 50).values.map(_._1)
    assert(rawOnly.forall(_ < targetLike),
      s"target-vocabulary doc 100 ($targetLike) must outweigh raw-only docs (max ${rawOnly.max})")
    // zero-token doc still scores and carries weight 0
    val withEmpty = docs.union(Seq((200L, "!!!")).toDF("doc_id", "text"))
    val oe = TextRetrieval.dsirSelect(withEmpty, col("doc_id") % 2 === 0 && col("doc_id") < 50L,
        k = 5, hexChars = 2).filter(col("doc_id") === 200L).collect()
    assert(oe.length == 1 && oe.head.getAs[Double]("weight") == 0.0 &&
      oe.head.getAs[Long]("n_feats") == 0L)
  }

  test("qualityClassifierScores: separable vocabularies classify perfectly; empty doc scores the prior") {
    // positives and negatives use disjoint vocabularies — NB must
    // separate them completely; the unlabeled doc 100 written in the
    // positive vocabulary must be predicted positive
    val docs = ((0L until 30L).map { i =>
      val txt = if (i % 3 == 0) "crystal resonance field harmonic flux modulation"
      else "timber joist rafter purlin sill beam"
      (i, txt)
    } ++ Seq((100L, "crystal flux harmonic resonance"), (200L, "???")))
      .toDF("doc_id", "text")
    val out = TextRetrieval.qualityClassifierScores(docs,
        col("doc_id") % 3 === 0 && col("doc_id") < 50L)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("score"), r.getAs[Boolean]("predicted"),
          r.getAs[Long]("n_feats")))).toMap
    assert(out.size == 32, "every input doc must score")
    (0L until 30L).foreach { i =>
      assert(out(i)._2 == (i % 3 == 0), s"doc $i misclassified: ${out(i)}")
    }
    assert(out(100L)._2, s"positive-vocabulary doc 100 predicted negative: ${out(100L)}")
    // zero-token doc: prior-only score (more negatives than positives
    // in the training set -> predicted negative), zero features
    assert(out(200L)._3 == 0L && !out(200L)._2, s"empty doc: ${out(200L)}")
  }

  test("extractHtmlText: content survives, boilerplate drops, entities decode once") {
    import graft.operators.TextExtract
    val docs = Seq(
      // 0: content line with ONE link but long text must SURVIVE (the
      // link-density rule, not a blanket anchor ban), nav must drop
      (0L, "<body><nav><a href=\"/a\">a</a> <a href=\"/b\">b</a></nav>" +
        "<p>a long content sentence that mentions the <a href=\"/x\">reference</a> " +
        "and keeps going well past the cutoff</p></body>"),
      // 1: double-encoded entity decodes ONCE (&amp;lt; -> &lt;, not <)
      (1L, "<p>x &amp;lt; y</p>"),
      // 2: script body with tags inside a string must vanish whole
      (2L, "<p>kept</p><script>var s = \"<p>fake</p>\";</script><div>also kept " +
        "because this line is long enough to pass</div>"),
      // 3: no markup at all — one line, kept verbatim
      (3L, "plain text only"),
      // 4: empty document
      (4L, ""),
      // 5: PRETTY-PRINTED html — tags broken across physical lines
      // (the real-crawl case): both anchors must count (and the nav
      // drop), the paragraph must stay ONE logical line even though
      // the source wraps it, and no attribute text may leak
      (5L, "<body><nav><a\nhref=\"/a\">a</a> <a\thref=\"/b\">b</a></nav>\n" +
        "<p>\nwrapped paragraph content that keeps going\nwell past the length"
        + " cutoff on one logical line\n</p></body>"))
      .toDF("doc_id", "html")
    val out = TextExtract.extractHtmlText(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    assert(out(0L)._3.startsWith("a long content sentence"), s"content dropped: ${out(0L)}")
    assert(out(0L)._3.contains("reference"), "inline link text must survive")
    assert(!out(0L)._3.contains(" a b"), "nav boilerplate leaked")
    assert(out(0L)._2 == 1L, s"nav must be the one dropped line: ${out(0L)}")
    assert(out(1L)._3 == "x &lt; y", s"double-encoded entity over-decoded: ${out(1L)._3}")
    assert(out(2L)._3 == "kept also kept because this line is long enough to pass",
      s"script body leaked: ${out(2L)._3}")
    assert(out(3L)._3 == "plain text only")
    assert(out(4L)._1 == 0L && out(4L)._3 == "", s"empty doc: ${out(4L)}")
    assert(out(5L)._3 == "wrapped paragraph content that keeps going well past"
      + " the length cutoff on one logical line",
      s"pretty-printed html mishandled: ${out(5L)}")
    assert(out(5L)._2 == 1L, s"line-broken nav must drop as ONE line: ${out(5L)}")
    assert(!out(5L)._3.contains("href"), "attribute text leaked from a line-broken tag")
  }

  test("canonicalizeUrl: RFC-3986 rules and the edges the regexes must not overreach") {
    import spark.implicits._
    import graft.operators.TextExtract
    val cases = Seq(
      // authority lowercases, path case is PRESERVED
      "HTTPS://WWW.Example.COM/Path/File.HTML" -> "https://example.com/Path/File.HTML",
      // default ports strip; non-default ports stay
      "http://a.com:80/x" -> "http://a.com/x",
      "https://a.com:443/x" -> "https://a.com/x",
      "http://a.com:8080/x" -> "http://a.com:8080/x",
      // fragment + trailing slashes
      "https://a.com/x/y//#frag" -> "https://a.com/x/y",
      // tracking-only query vanishes entirely
      "https://a.com/x?utm_source=s&utm_medium=m&gclid=G" -> "https://a.com/x",
      // params sort; tracking strips mid-list; '?' in a VALUE stays
      // part of the first query (strpos takes the first '?')
      "https://a.com/x?b=2&fbclid=F&a=1" -> "https://a.com/x?a=1&b=2",
      "https://a.com/x?b=c?d&a=1" -> "https://a.com/x?a=1&b=c?d",
      // a bare param with no '=' is kept unless it IS a tracking name
      "https://a.com/x?ref&z" -> "https://a.com/x?z",
      // 'reference' is NOT the tracking param 'ref' (the (=|$) anchor)
      "https://a.com/x?reference=1" -> "https://a.com/x?reference=1",
      // www only strips as a LEADING host label
      "https://notwww.com/x" -> "https://notwww.com/x",
      // scheme-less input degrades gracefully (no authority rules)
      "/relative/path/?a=1" -> "/relative/path?a=1",
      // whitespace trims
      "  https://a.com/x  " -> "https://a.com/x")
    val out = cases.map(_._1).toDF("url")
      .select(col("url"), TextExtract.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(out(in) == want, s"canonicalizeUrl('$in') = '${out(in)}', want '$want'")
    }
  }

  test("chunkByTokenCounts fails loudly when nSub misses a corpus word") {
    import graft.operators.TextDedup
    val docs = Seq((0L, "alpha beta gamma")).toDF("doc_id", "text")
    val partial = Seq(("alpha", 2L), ("gamma", 1L)).toDF("word", "n_sub")
    val ex = intercept[Exception] {
      TextDedup.chunkByTokenCounts(docs, partial, chunkTokens = 4).collect()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: causes(t.getCause)
    assert(causes(ex).exists(m => m != null && m.contains("absent from nSub")),
      s"expected the loud missing-word error, got: ${ex.getMessage}")
  }
}
