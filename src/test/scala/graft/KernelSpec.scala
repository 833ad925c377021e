package graft

import graft.model.ExpressionMatrix
import graft.operators.{Batch, Cluster, Meta, Normalize, QC}
import graft.sources.MatrixIO
import org.apache.spark.sql.functions._

class KernelSpec extends SparkSpec {
  import spark.implicits._

  test("SQL extensions register qnorm/pnorm/vec_dot") {
    val r = spark.sql(
      "SELECT qnorm(0.975) AS q, pnorm(1.959963984540054) AS p, " +
      "vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(math.abs(r.getDouble(0) - 1.959963984540054) < 1e-9)
    assert(math.abs(r.getDouble(1) - 0.975) < 1e-9)
    assert(r.getDouble(2) == 11.0)
    val c = spark.sql(
      "SELECT compression_ratio(repeat('spam ', 200)) AS lo, " +
      "compression_ratio('') AS empty").head()
    assert(c.getDouble(0) < 0.1, s"repetitive ratio ${c.getDouble(0)}")
    assert(c.getDouble(1) == 1.0)
  }

  test("combat removes an additive batch effect, preserves grand structure") {
    // two batches, batch B shifted +10 on every gene
    val rows = for {
      g <- 1 to 20; b <- Seq("X", "Y"); i <- 1 to 5
    } yield {
      val base = g.toDouble + i * 0.1
      (s"g$g", s"s$b$i", base + (if (b == "Y") 10.0 else 0.0))
    }
    val m = ExpressionMatrix(rows.toDF("gene_id", "sample_id", "value"))
    val batches = rows.map(r => (r._2, r._2.substring(1, 2))).distinct.toDF("sample_id", "batch")
    val adj = Batch.combat(m, batches).df
    val byBatch = adj.join(batches, Seq("sample_id"))
      .groupBy("batch").agg(avg("value").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // batch means should be pulled together (within ~0.5 after EB)
    assert(math.abs(byBatch("X") - byBatch("Y")) < 0.5,
      s"batch means after ComBat: $byBatch")
  }

  test("combatWithCovariates removes the batch shift but preserves the group effect") {
    // 2 batches × 2 groups, balanced: value = gene base + 2.0 group
    // effect (treatment) + 10.0 batch effect (Y) + small deterministic
    // noise. The ~group design must keep the 2.0 treatment difference
    // out of the batch correction.
    val rows = for {
      g <- 1 to 20; b <- Seq("X", "Y"); grp <- Seq("ctl", "trt"); i <- 1 to 3
    } yield {
      val noise = ((g * 7 + i * 3 + b.hashCode % 5) % 11) * 0.02
      (s"g$g", s"s$b-$grp-$i", b, grp,
        g.toDouble + (if (grp == "trt") 2.0 else 0.0) + (if (b == "Y") 10.0 else 0.0) + noise)
    }
    val m = ExpressionMatrix(rows.map(r => (r._1, r._2, r._5)).toDF("gene_id", "sample_id", "value"))
    val batches = rows.map(r => (r._2, r._3)).distinct.toDF("sample_id", "batch")
    val groups = rows.map(r => (r._2, r._4)).distinct.toDF("sample_id", "group")
    val adj = Batch.combatWithCovariates(m, batches, groups).df
      .join(batches, Seq("sample_id")).join(groups, Seq("sample_id"))
    val byBatch = adj.groupBy("batch").agg(avg("value").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(byBatch("X") - byBatch("Y")) < 0.3,
      s"batch means after covariate ComBat: $byBatch")
    val byGroup = adj.groupBy("group").agg(avg("value").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs((byGroup("trt") - byGroup("ctl")) - 2.0) < 0.3,
      s"treatment effect not preserved: $byGroup")
  }

  test("nonparametric posterior matches the int.eprior definition directly") {
    // small fixture; direct O(G^2) computation of the reference's
    // log-likelihood-weighted posterior vs the relational operator
    val rows = for (g <- 1 to 8; i <- 1 to 5) yield
      (s"g$g", s"s$i", "b1", g * 1.0 + i * 0.3 + (g * i % 3) * 0.25)
    val df = rows.toDF("gene_id", "sample_id", "batch", "z")
    val gb = df.groupBy("gene_id", "batch")
      .agg(count(lit(1)).as("n_b"), avg("z").as("gamma_hat"),
        var_samp("z").as("delta2_hat"))
    val out = Batch.nonparametricPosterior(df, gb, geneCap = 100)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    // direct definition
    val zByGene = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._4) }
    val params = zByGene.map { case (g, zs) =>
      val n = zs.size; val mean = zs.sum / n
      val v = zs.map(x => (x - mean) * (x - mean)).sum / (n - 1)
      g -> (mean, v)
    }
    for ((g, zs) <- zByGene) {
      val others = params.filter(_._1 != g).toSeq
      val lls = others.map { case (_, (gamma, d)) =>
        zs.map(x => -0.5 * math.log(2 * math.Pi * d) - (x - gamma) * (x - gamma) / (2 * d)).sum
      }
      val mx = lls.max
      val ws = lls.map(l => math.exp(l - mx))
      val gStar = others.zip(ws).map { case ((_, (gamma, _)), w) => gamma * w }.sum / ws.sum
      val dStar = others.zip(ws).map { case ((_, (_, d)), w) => d * w }.sum / ws.sum
      assert(math.abs(out(g)._1 - gStar) < 1e-9, s"$g g_star ${out(g)._1} vs $gStar")
      assert(math.abs(out(g)._2 - dStar) < 1e-9, s"$g d_star ${out(g)._2} vs $dStar")
    }
  }

  test("cqn removes a synthetic GC gradient that cqnLite leaves in place") {
    // 60 genes on a GC grid, counts = 2^(8 + 6(gc−0.5)) — a pure GC
    // artifact; two samples with 4x library-size difference. After the
    // spline correction the regression slope of value on GC must be
    // near zero; the uncorrected log2-CPM slope is ≈ 6.
    val genes = (1 to 60).map(i => (s"g%02d".format(i), 0.3 + 0.4 * (i - 1) / 59.0, 1000.0))
    val rows = for ((g, gc, _) <- genes; s <- Seq("s1", "s2")) yield {
      val libFactor = if (s == "s1") 1.0 else 4.0
      (g, s, math.pow(2.0, 8.0 + 6.0 * (gc - 0.5)) * libFactor)
    }
    val m = ExpressionMatrix(rows.toDF("gene_id", "sample_id", "value"))
    val info = genes.toDF("gene_id", "gc", "length")
    def gcSlope(mat: ExpressionMatrix): Double =
      mat.canonical.df.filter(col("value") =!= 0.0)
        .join(info, Seq("gene_id"))
        .agg((covar_samp(col("value"), col("gc")) / var_samp(col("gc"))).as("slope"))
        .head().getDouble(0)
    val rawSlope = gcSlope(Normalize.log2Cpm(m))
    assert(rawSlope > 5.0, s"fixture GC trend missing: $rawSlope")
    val corrected = Normalize.cqn(m, info, bins = 6)
    val slope = gcSlope(corrected)
    assert(math.abs(slope) < 0.8, s"GC effect not removed: slope $slope (raw $rawSlope)")
    // the reference's floor still applies
    assert(corrected.df.filter(col("value") < 2.0 && col("value") =!= 0.0).count() == 0)
  }

  test("cqn length offset: doubling gene length halves its RPKM-scale value") {
    val genes = Seq(("gShort", 0.5, 1000.0), ("gLong", 0.5, 2000.0)) ++
      (1 to 20).map(i => (s"bg$i", 0.3 + (i % 7) * 0.05, 1000.0))
    val rows = for ((g, _, _) <- genes; s <- Seq("s1", "s2"))
      yield (g, s, if (g.startsWith("g")) 256.0 else 64.0 + (g.hashCode % 32).abs)
    val m = ExpressionMatrix(rows.toDF("gene_id", "sample_id", "value"))
    val info = genes.toDF("gene_id", "gc", "length")
    // same counts, same GC: the longer gene must come out lower (the
    // log2(length/1e3) offset), surviving quantile normalisation
    val out = Normalize.cqn(m, info, bins = 4, clampBelow = -1e9).canonical.df
      .filter(col("sample_id") === "s1")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("gShort") > out("gLong"), s"length offset missing: $out")
  }

  test("rsn aligns array distributions smoothly and preserves within-array order") {
    // three arrays: s2/s3 are affine warps of s1 — RSN must pull all
    // three onto the shared target while keeping each array's ranking
    val rows = for (g <- 1 to 200; s <- Seq("s1", "s2", "s3")) yield {
      val base = 5.0 + (g % 47) * 0.2 + (g % 13) * 0.05
      val v = s match {
        case "s1" => base
        case "s2" => base * 1.6 + 2.0
        case _    => base * 0.7 - 1.0
      }
      (s"g%03d".format(g), s, v)
    }
    val m = ExpressionMatrix(rows.toDF("gene_id", "sample_id", "value"))
    val out = Normalize.rsn(m, bins = 10)
    val means = out.df.groupBy("sample_id").agg(avg("value").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val spread = means.values.max - means.values.min
    val rawSpread = {
      val rm = m.df.groupBy("sample_id").agg(avg("value").as("m"))
        .collect().map(_.getDouble(1))
      rm.max - rm.min
    }
    assert(spread < rawSpread / 10.0, s"distributions not aligned: $means vs raw $rawSpread")
    // within-sample order preserved (monotone mapping)
    for (s <- Seq("s1", "s2", "s3")) {
      val vals = out.df.filter(col("sample_id") === s)
        .join(m.df.filter(col("sample_id") === s)
          .select(col("gene_id"), col("value").as("raw")), Seq("gene_id"))
        .orderBy("raw").select("value").collect().map(_.getDouble(0))
      vals.sliding(2).foreach { case Array(a, b) => assert(a <= b + 1e-9); case _ => }
    }
  }

  test("rsn survives heavily tied (discrete) arrays: coincident anchors collapse, no NaN/Inf") {
    // 90% of each array sits on a 3-level discrete grid → several
    // quantile bins share the same mean value, so anchors coincide;
    // without the collapse the zero-width segment divides by zero
    val rows = for (g <- 1 to 120; s <- Seq("s1", "s2")) yield {
      val v = (g % 10) match {
        case 9 => 10.0 + g * 0.01 + (if (s == "s2") 1.0 else 0.0)
        case k => (k % 3).toDouble + (if (s == "s2") 1.0 else 0.0)
      }
      (s"g%03d".format(g), s, v)
    }
    val m = ExpressionMatrix(rows.toDF("gene_id", "sample_id", "value"))
    val out = Normalize.rsn(m, bins = 10).df.collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val v = r.getDouble(2)
      assert(!v.isNaN && !v.isInfinite, s"degenerate rsn value $v in $r")
    }
  }

  test("pca: deterministic power-iteration PCA separates planted sample clusters") {
    // 12 genes x 24 samples; samples 13-24 shifted up on genes g01-g06
    // -> pc1 must separate the two sample groups
    val genes = (1 to 12).map(i => f"g$i%02d")
    val rows = for (g <- 1 to 12; s <- 1 to 24) yield {
      val shift = if (s > 12 && g <= 6) 4.0 else 0.0
      val noise = (((g * 31 + s * 17) % 13) - 6) * 0.1
      (f"g$g%02d", f"s$s%02d", 10.0 + g * 0.3 + shift + noise)
    }
    val m = ExpressionMatrix(rows.toDF("gene_id", "sample_id", "value"))
    val pcs = QC.pca(m, k = 2, genes).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val lo = (1 to 12).map(s => pcs(f"s$s%02d"))
    val hi = (13 to 24).map(s => pcs(f"s$s%02d"))
    assert(lo.max < hi.min || hi.max < lo.min,
      s"pc1 does not separate planted clusters: $lo vs $hi")
  }

  test("pca: dual (S×S Gramian) path reproduces the primal PCs") {
    // 40 genes x 10 samples — the genes ≫ samples shape where the
    // G×G collect stops scaling; the dual path must emit the SAME
    // coordinates (same eigenpairs, same sign convention)
    val genes = (1 to 40).map(i => f"g$i%02d")
    val rows = for (g <- 1 to 40; s <- 1 to 10) yield {
      val shift = if (s > 5 && g <= 20) 3.0 else 0.0
      val noise = (((g * 37 + s * 23) % 17) - 8) * 0.15
      (f"g$g%02d", f"s$s%02d", 8.0 + g * 0.2 + shift + noise)
    }
    val m = ExpressionMatrix(rows.toDF("gene_id", "sample_id", "value"))
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val primal = asMap(QC.pca(m, k = 2, genes, forceDual = Some(false)))
    val dual = asMap(QC.pca(m, k = 2, genes, forceDual = Some(true)))
    assert(primal.keySet == dual.keySet)
    primal.foreach { case (s, (p1, p2)) =>
      val (d1, d2) = dual(s)
      assert(math.abs(p1 - d1) < 1e-6 && math.abs(p2 - d2) < 1e-6,
        s"sample $s: primal ($p1,$p2) vs dual ($d1,$d2)")
    }
    // default dispatch keeps SMALL inputs primal even when G > S (the
    // 256-gene floor protects hash-gated fixtures from an arithmetic-
    // path flip) ...
    val auto = asMap(QC.pca(m, k = 2, genes))
    assert(auto == primal)
    // ... and switches to dual once the gene axis is genuinely large
    val genesBig = (1 to 300).map(i => f"G$i%03d")
    val rowsBig = for (g <- 1 to 300; s <- 1 to 5) yield {
      val shift = if (s > 2 && g <= 150) 2.0 else 0.0
      (f"G$g%03d", f"s$s%02d", 5.0 + (((g * 13 + s * 29) % 11) - 5) * 0.2 + shift)
    }
    val mBig = ExpressionMatrix(rowsBig.toDF("gene_id", "sample_id", "value"))
    val autoBig = asMap(QC.pca(mBig, k = 2, genesBig))
    val dualBig = asMap(QC.pca(mBig, k = 2, genesBig, forceDual = Some(true)))
    assert(autoBig == dualBig)
  }

  test("StatAlgebra.pnormAS tracks the commons-math CDF within the A&S bound") {
    import graft.functions.{StatAlgebra, StatKernels}
    val zs = (-60 to 60).map(_ / 10.0)
    val df = zs.toDF("z")
    val got = df.select(col("z"), StatAlgebra.pnormAS(col("z")).as("p"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    zs.foreach { z =>
      val want = StatKernels.pnorm(z)
      assert(math.abs(got(z) - want) < 2e-7, s"pnormAS($z)=${got(z)} vs $want")
    }
  }

  test("rmaBackground strips additive background: monotone, below observed, near the signal") {
    import graft.operators.Normalize
    // one sample, deterministic exp(rate 1/200)+N(500, 60²) mixture
    // via inverse-CDF grids — the model the convolution assumes
    val n = 2000
    val rows = (0 until n).map { i =>
      val u1 = (i * 0.61803398875) % 1.0
      val u2 = (i * 0.3819660113) % 1.0
      val signal = -200.0 * math.log(1.0 - 0.999 * u1)
      val bg = 500.0 + 60.0 * graft.functions.StatKernels.qnorm(0.001 + 0.998 * u2)
      (s"g$i", "s1", signal + bg, signal)
    }
    val m = ExpressionMatrix(rows.map(r => (r._1, r._2, r._3)).toDF("gene_id", "sample_id", "value"))
    val corrected = Normalize.rmaBackground(m).df.collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val byGene = rows.map(r => r._1 -> (r._3, r._4)).toMap
    // corrected < observed everywhere (background is strictly positive
    // in this model) and the corrected values track the true signal
    // better than the raw observations do
    var sseRaw = 0.0; var sseCorr = 0.0
    byGene.foreach { case (g, (obs, sig)) =>
      val c = corrected(g)
      assert(c < obs, s"$g: corrected $c not below observed $obs")
      sseRaw += (obs - sig) * (obs - sig)
      sseCorr += (c - sig) * (c - sig)
    }
    assert(sseCorr < sseRaw * 0.2,
      f"background correction did not help: corr=$sseCorr%.0f raw=$sseRaw%.0f")
    // monotone in the observation (E[s|o] is increasing in o)
    val sorted = rows.sortBy(_._3).map(r => corrected(r._1))
    sorted.sliding(2).foreach { case Seq(a, b) =>
      assert(a <= b + 1e-9, "correction not monotone in observed value")
    }
  }

  test("rmaBackground degenerate samples fall back to identity, never vanish") {
    import graft.operators.Normalize
    // s_const: constant-valued sample and s_single: one-row sample —
    // both give zero-width histogram bins, so parameter estimation
    // degenerates and the lower-half/moment relations go empty or
    // null; s_ok: a healthy spread. The first two must survive with
    // identity correction, s_ok corrects.
    val rows =
      (0 until 50).map(i => (s"g$i", "s_const", 100.0)) ++
      Seq(("g0", "s_single", 42.0)) ++
      (0 until 50).map(i => (s"g$i", "s_ok", 50.0 + i * 37.0))
    val m = ExpressionMatrix(rows.toDF("gene_id", "sample_id", "value"))
    val out = Normalize.rmaBackground(m).df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out.size == rows.size, s"rows vanished: ${rows.size} in, ${out.size} out")
    rows.filter(r => r._2 == "s_const" || r._2 == "s_single").foreach { case (g, s, v) =>
      assert(out((g, s)) == v, s"degenerate sample $s gene $g: ${out((g, s))} != identity $v")
    }
    val okChanged = rows.filter(_._2 == "s_ok").count { case (g, s, v) => out((g, s)) != v }
    assert(okChanged > 40, "healthy sample was not corrected")
  }

  test("cmdscale reconstructs planar distances exactly in 2 dimensions") {
    // four points in the plane; squared distances in, coordinates out:
    // pairwise distances of the embedding must match the input
    val pts = Map("a" -> (0.0, 0.0), "b" -> (3.0, 0.0), "c" -> (0.0, 4.0), "d" -> (3.0, 4.0))
    val dist2 = (for {
      Seq(s1, s2) <- pts.keys.toSeq.sorted.combinations(2).toSeq
      (x1, y1) = pts(s1); (x2, y2) = pts(s2)
    } yield (s1, s2, (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2), 1L))
      .toDF("s1", "s2", "dist2", "n_genes")
    val out = Cluster.cmdscale(dist2, k = 2).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(3))).toMap
    for (Seq(s1, s2) <- pts.keys.toSeq.sorted.combinations(2)) {
      val (x1, y1) = out(s1); val (x2, y2) = out(s2)
      val got = (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)
      val (p1, q1) = pts(s1); val (p2, q2) = pts(s2)
      val want = (p1 - p2) * (p1 - p2) + (q1 - q2) * (q1 - q2)
      assert(math.abs(got - want) < 1e-9, s"$s1-$s2: $got vs $want")
    }
  }

  test("QC tables: NUSE flags the noisy array, rnaDegradation recovers a known slope") {
    // NUSE: sample s4's probes are noisy within every probeset
    val rows = for (ps <- 1 to 15; p <- 1 to 4; sIdx <- 1 to 4) yield {
      val noise = if (sIdx == 4) ((ps * 13 + p * 7) % 9 - 4) * 1.0
                  else ((ps + p + sIdx) % 3 - 1) * 0.05
      (s"ps$ps-p$p", s"s$sIdx", 10.0 + ps * 0.2 + p * 0.5 + noise, s"ps$ps")
    }
    val probes = ExpressionMatrix(rows.map(r => (r._1, r._2, r._3))
      .toDF("gene_id", "sample_id", "value"))
    val annot = rows.map(r => (r._1, r._4)).distinct.toDF("probe", "probeset")
    val nuse = QC.nuse(probes, annot).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(nuse("s4") > nuse("s1"), s"noisy array not flagged: $nuse")
    // RNA degradation: s1 rises 2.0 per position, s2 is flat
    val deg = QC.rnaDegradation(Seq(
        ("s1", 1, 10.0), ("s1", 2, 12.0), ("s1", 3, 14.0), ("s1", 4, 16.0),
        ("s2", 1, 10.0), ("s2", 2, 10.0), ("s2", 3, 10.0), ("s2", 4, 10.0))
      .toDF("sample_id", "position", "value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(deg("s1") - 2.0) < 1e-9 && math.abs(deg("s2")) < 1e-9)
  }

  test("ward linkage merges the closest pair first, deterministic labels") {
    val m = ExpressionMatrix(Seq(
      ("g1", "a", 0.0), ("g1", "b", 0.1), ("g1", "c", 5.0),
      ("g2", "a", 0.0), ("g2", "b", 0.1), ("g2", "c", 5.0)).toDF("gene_id", "sample_id", "value"))
    val merges = Cluster.wardLinkage(Cluster.sampleDistances(m))
    assert(merges.head.left == "a" && merges.head.right == "b")
    assert(merges.size == 2)
    assert(merges(1).height > merges.head.height)
  }

  test("logisticZScores finds positive slope for separable gene, ~0 for null") {
    val rows = for (i <- 1 to 40) yield {
      val y = if (i <= 20) 0.0 else 1.0
      // overlapping distributions (perfect separation collapses the
      // Wald z — Hauck–Donner — so keep the signal moderate)
      Seq(("sep", s"s$i", y * 1.5 + (i % 10) * 0.3, y),
          ("null", s"s$i", (i % 7).toDouble, y))
    }
    val flat = rows.flatten
    val m = ExpressionMatrix(flat.map(t => (t._1, t._2, t._3)).toDF("gene_id", "sample_id", "value"))
    val outcomes = flat.map(t => (t._2, t._4)).distinct.toDF("sample_id", "outcome")
    val z = Meta.logisticZScores(m, outcomes).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(z("sep") > 1.5, s"separable gene z=${z("sep")}")
    assert(math.abs(z("null")) < 1.5, s"null gene z=${z("null")}")
  }

  test("enrichment: fully-overlapping term gets small p, disjoint term large p") {
    val term2gene = (Seq.tabulate(10)(i => ("hit", s"g$i")) ++
      Seq.tabulate(10)(i => ("miss", s"h$i"))).toDF("term", "gene_id")
    val sig = Seq.tabulate(10)(i => Tuple1(s"g$i")).toDF("gene_id")
    val universe = (Seq.tabulate(10)(i => s"g$i") ++ Seq.tabulate(90)(i => s"h$i"))
      .map(Tuple1(_)).toDF("gene_id")
    val p = Meta.enrichment(term2gene, sig, universe).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p")).toMap
    assert(p("hit") < 1e-6)
    assert(p("miss") > 0.5)
  }

  test("permutationFdr: a strong real effect gets low FDR") {
    val rows = for (g <- 1 to 30; i <- 1 to 10) yield {
      val grp = if (i <= 5) "A" else "B"
      val signal = if (g == 1 && grp == "A") 5.0 else 0.0
      (s"g$g", s"s$i", signal + ((g * 13 + i * 7) % 11) * 0.1)
    }
    val m = ExpressionMatrix(rows.toDF("gene_id", "sample_id", "value"))
    val groups = (1 to 10).map(i => (s"s$i", if (i <= 5) "A" else "B")).toDF("sample_id", "group")
    val fdr = Meta.permutationFdr(m, groups, "A", "B", nperm = 20).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(fdr("g1") < 0.2, s"signal gene fdr=${fdr("g1")}")
  }

  test("TSV matrix roundtrip preserves values (S1/S2)") {
    val m = ExpressionMatrix(Seq(
      ("g1", "s1", 1.5), ("g1", "s2", 2.5), ("g2", "s1", 3.0), ("g2", "s2", 4.0))
      .toDF("gene_id", "sample_id", "value"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tsv").toString + "/mat"
    MatrixIO.writeTsvMatrix(m, Seq("s1", "s2"), dir)
    val back = MatrixIO.readTsvMatrix(spark, dir).canonical.df
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(back(("g1", "s2")) == 2.5 && back(("g2", "s1")) == 3.0)
  }

  test("cqnLite floors low expression at zero and preserves sample rank order") {
    val rows = for (g <- 1 to 10; s <- 1 to 4) yield
      (s"g$g", s"s$s", (g * s).toDouble)
    val out = Normalize.cqnLite(ExpressionMatrix(rows.toDF("gene_id", "sample_id", "value"))).df
    val vals = out.select("value").as[Double].collect()
    assert(vals.forall(v => v == 0.0 || v >= 2.0))
  }

  test("medianPolish recovers additive probe/sample effects") {
    // value = overall(5) + probe effect + sample effect (median-zero sets)
    val probeEff = Map("p1" -> -1.0, "p2" -> 0.0, "p3" -> 2.0)
    val sampleEff = Map("s1" -> -0.5, "s2" -> 0.0, "s3" -> 1.5)
    val rows = for (p <- probeEff.keys.toSeq; s <- sampleEff.keys.toSeq)
      yield (p, s, 5.0 + probeEff(p) + sampleEff(s))
    val m = graft.model.ExpressionMatrix(rows.toDF("gene_id", "sample_id", "value"))
    val annot = probeEff.keys.toSeq.map(p => (p, "ps1")).toDF("probe", "probeset")
    val out = graft.operators.Dedup.medianPolish(m, annot).df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for ((s, e) <- sampleEff)
      assert(math.abs(out(("ps1", s)) - (5.0 + e)) < 1e-9,
        s"sample $s: got ${out(("ps1", s))}")
  }

  test("lowessFit is exact on collinear points, robust to a gross outlier") {
    // local LINEAR fit on collinear points reproduces the line exactly
    val x = (0 until 60).map(i => i * 0.25).toArray
    val line = x.map(v => 2.0 * v + 1.0)
    val fit = Normalize.lowessFit(x, line)
    for (i <- x.indices)
      assert(math.abs(fit(i) - line(i)) < 1e-9, s"i=$i: ${fit(i)} vs ${line(i)}")
    // one gross outlier in NOISY data (exact-fit data degenerates the
    // 6·median scale — the effectively-zero freeze keeps the pass-1
    // fit there, matching R's break): the bisquare iterations zero
    // the outlier's weight, so the fit matches the outlier-free fit
    val noisy = x.indices.map(i => line(i) + 0.1 * math.sin(i * 2.7)).toArray
    val dirty = noisy.clone(); dirty(30) += 100.0
    val clean = Normalize.lowessFit(x, noisy)
    val robust = Normalize.lowessFit(x, dirty)
    for (i <- x.indices)
      assert(math.abs(robust(i) - clean(i)) < 0.05,
        s"i=$i: with-outlier ${robust(i)} vs clean ${clean(i)}")
  }

  test("lowessFit sliding window equals the minimal-left-edge specification") {
    // the Scala kernel slides the window greedily (R's d1 > d2 rule);
    // the DuckDB oracle computes the minimal L with
    // x(i) - x(L) <= x(L+ns) - x(i). This re-implements the fit with
    // the brute-force minimal-L selection and asserts bit-identical
    // output on pseudo-random data with ties.
    def lowessMinL(x: Array[Double], y: Array[Double], f: Double, iters: Int): Array[Double] = {
      val n = x.length
      val ns = math.max(2, math.min(n, (f * n + 1e-7).toInt))
      val range = x(n - 1) - x(0)
      val rw = Array.fill(n)(1.0)
      val fit = new Array[Double](n)
      var frozen = false
      for (iter <- 1 to iters + 1) {
        for (i <- 0 until n) {
          val lcap = n - ns
          val nleft = (0 to lcap).find(l =>
            l == lcap || x(i) - x(l) <= x(l + ns) - x(i)).get
          val h = math.max(x(i) - x(nleft), x(nleft + ns - 1) - x(i))
          val w = new Array[Double](ns)
          var a = 0.0
          for (k <- 0 until ns) {
            val r = math.abs(x(nleft + k) - x(i))
            var wk = 0.0
            if (r <= 0.001 * h) wk = 1.0
            else if (r <= 0.999 * h) { val u = r / h; val t = 1.0 - u * u * u; wk = t * t * t }
            if (iter > 1) wk *= rw(nleft + k)
            w(k) = wk; a += wk
          }
          if (a <= 0) fit(i) = y(i)
          else {
            for (k <- 0 until ns) w(k) /= a
            if (h > 0) {
              var xm = 0.0
              for (k <- 0 until ns) xm += w(k) * x(nleft + k)
              var cc = 0.0
              for (k <- 0 until ns) { val d = x(nleft + k) - xm; cc += w(k) * d * d }
              if (math.sqrt(cc) > 0.001 * range) {
                val b = (x(i) - xm) / cc
                for (k <- 0 until ns) w(k) *= b * (x(nleft + k) - xm) + 1.0
              }
            }
            var s = 0.0
            for (k <- 0 until ns) s += w(k) * y(nleft + k)
            fit(i) = s
          }
        }
        if (iter <= iters && !frozen) {
          val ar = Array.tabulate(n)(j => math.abs(y(j) - fit(j)))
          val sorted = ar.sorted
          val cmad = if (n % 2 == 0) 3.0 * (sorted(n / 2 - 1) + sorted(n / 2))
            else 6.0 * sorted(n / 2)
          if (cmad <= 1e-7 * (ar.sum / n)) frozen = true
          else for (j <- 0 until n) {
            val r = ar(j)
            rw(j) = if (r <= 0.001 * cmad) 1.0
              else if (r <= 0.999 * cmad) { val u = 1.0 - (r / cmad) * (r / cmad); u * u }
              else 0.0
          }
        }
      }
      fit
    }
    // deterministic pseudo-random data with tie runs
    var seed = 12345L
    def next(): Double = { seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 24) % 1000000L).toDouble / 1000000.0 }
    val xs = Array.tabulate(137)(i => math.floor(next() * 40.0) / 4.0).sorted
    val ys = xs.map(v => math.sin(v) + next() * 0.4)
    val a = Normalize.lowessFit(xs, ys)
    val b = lowessMinL(xs, ys, 0.5, 3)
    for (i <- xs.indices)
      assert(a(i) == b(i), s"i=$i: greedy ${a(i)} vs minimal-L ${b(i)}")
  }

  test("voom: positive per-observation weights, log2-CPM values exact") {
    val rows = for { g <- 1 to 30; i <- 1 to 8 } yield
      (s"g$g", s"s$i", ((g * 13 + i * 7) % 50 + 1).toDouble * (if (i % 2 == 0) 1.5 else 1.0))
    val m = ExpressionMatrix(rows.toDF("gene_id", "sample_id", "value"))
    val groups = (1 to 8).map(i => (s"s$i", if (i % 2 == 0) "A" else "B"))
      .toDF("sample_id", "group")
    val out = Normalize.voom(m, groups)
    assert(out.count() == 30L * 8)
    assert(out.filter(col("weight") <= 0 || col("weight").isNull).count() == 0)
    // values are the plain log2-CPM of the input counts
    val libs = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val got = out.select("gene_id", "sample_id", "value").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for ((g, s, c) <- rows.take(20)) {
      val expect = math.log((c + 0.5) / (libs(s) + 1.0) * 1e6) / math.log(2.0)
      assert(math.abs(got((g, s)) - expect) < 1e-9)
    }
  }

  test("combined voom x array weights degrade to each side at unit weight") {
    import graft.operators.DiffExpr
    val rows = for { g <- 1 to 30; i <- 1 to 8 } yield
      (s"g$g", s"s$i", ((g * 13 + i * 7) % 50 + 1).toDouble * (if (i % 2 == 0) 1.5 else 1.0))
    val m = ExpressionMatrix(rows.toDF("gene_id", "sample_id", "value"))
    val groups = (1 to 8).map(i => (s"s$i", if (i % 2 == 0) "A" else "B"))
      .toDF("sample_id", "group")
    val vw = Normalize.voom(m, groups)
    def statsMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    def assertSame(a: Map[(String, String), (Double, Double, Double)],
        b: Map[(String, String), (Double, Double, Double)]): Unit = {
      assert(a.keySet == b.keySet)
      for (k <- a.keySet) {
        val ((n1, m1, v1), (n2, m2, v2)) = (a(k), b(k))
        assert(math.abs(n1 - n2) < 1e-9 && math.abs(m1 - m2) < 1e-9 &&
          math.abs(v1 - v2) < 1e-9, s"$k: ${a(k)} vs ${b(k)}")
      }
    }
    // unit ARRAY weights: combined == plain voom observation weights
    val unitArray = (1 to 8).map(i => (s"s$i", 1.0)).toDF("sample_id", "weight")
    assertSame(
      statsMap(DiffExpr.groupStatsObsWeighted(vw, groups)),
      statsMap(DiffExpr.groupStatsObsWeighted(
        DiffExpr.combineObsWeights(vw, unitArray), groups)))
    // unit OBSERVATION weights: combined == sample-grain arrayWeights path
    val someArray = (1 to 8).map(i => (s"s$i", 0.5 + (i % 3) * 0.5)).toDF("sample_id", "weight")
    val unitObs = vw.withColumn("weight", lit(1.0))
    assertSame(
      statsMap(DiffExpr.groupStatsObsWeighted(
        DiffExpr.combineObsWeights(unitObs, someArray), groups)),
      statsMap(DiffExpr.groupStatsWeighted(
        ExpressionMatrix(vw.select("gene_id", "sample_id", "value")), groups, someArray)))
  }
}
