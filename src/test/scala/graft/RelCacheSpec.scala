package graft

import graft.model.RelCache
import graft.operators.TextDedup
import org.apache.spark.sql.functions._

/** The persist-lifecycle contract (VERDICT r9 #7): operators that
  * persist shared intermediates hold them in [[RelCache]] slots, a
  * re-invocation releases the previous invocation's blocks, and
  * releaseAll is the explicit close — so a long-lived session can
  * chain incremental invocations without leaking MEMORY_AND_DISK
  * blocks, enforced by code rather than a caller-must-sweep comment. */
class RelCacheSpec extends SparkSpec {

  private def persisted: Int = spark.sparkContext.getPersistentRDDs.size

  test("no leaked blocks after two chained incremental near-dup invocations") {
    SparkEntry.clearQueryCaches()
    assert(persisted == 0, "stale persisted RDDs before the scenario")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref = docs.filter(col("doc_id") % 7 < 3)
    // two DIFFERENT crawls against the same reference — the chained-
    // session scenario (same plans would share cache entries and prove
    // nothing about accumulation)
    val crawl1 = docs.filter(col("doc_id") % 7 === 3)
    val crawl2 = docs.filter(col("doc_id") % 7 === 4)
    val r1 = TextDedup.nearDupAgainstReference(crawl1, ref,
      minJaccard = 0.3, md5Hashes = true)
    r1.count()
    val afterFirst = persisted
    assert(afterFirst > 0, "the operator should persist its shared relations")
    val r2 = TextDedup.nearDupAgainstReference(crawl2, ref,
      minJaccard = 0.3, md5Hashes = true)
    r2.count()
    // steady state: the second invocation REPLACED the first's blocks
    // (same-plan reference relation may be shared; nothing accumulates)
    assert(persisted <= afterFirst,
      s"chained invocations accumulated blocks: $afterFirst -> $persisted")
    // the explicit close drops everything the operators held
    RelCache.releaseAll()
    assert(persisted == 0,
      s"releaseAll left ${spark.sparkContext.getPersistentRDDs.size} blocks")
    assert(RelCache.liveSlots.isEmpty)
  }

  test("re-invocation with an IDENTICAL plan keeps the shared cache entry live") {
    SparkEntry.clearQueryCaches()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 200)
    def pairs() = TextDedup.minhashLshPairs(docs, k = 8, bands = 4,
      shingleWidth = 3, minJaccard = 0.3, md5Hashes = true)
    pairs().count()
    val n1 = persisted
    assert(n1 > 0)
    // a warm re-run builds the same plan: hold() must NOT unpersist the
    // entry the new invocation just re-used (CacheManager keys entries
    // by canonicalized plan — dropping the old would drop the new)
    val again = pairs()
    again.count()
    assert(persisted == n1, "identical-plan re-invocation changed the block set")
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val usesCache = again.queryExecution.executedPlan.exists {
      case _: InMemoryTableScanExec => true
      case p => p.children.isEmpty && p.toString.contains("InMemoryTableScan")
    }
    assert(usesCache, "the re-invocation no longer reads the cached relation")
    RelCache.releaseAll()
    assert(persisted == 0)
  }

  test("rolling slots stay bounded over many invocations and sweep clean") {
    SparkEntry.clearQueryCaches()
    assert(persisted == 0)
    val docs = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").as("id"),
        (col("l_extendedprice") % 1.0).as("p"))
    // 8 DIFFERENT-plan invocations of the bhAdjustScalable persists:
    // the rolling family must cap at its keep depth, not accumulate
    // (VERDICT r17 #7 — Verify-style sessions never sweep)
    val counts = (1 to 8).map { i =>
      graft.operators.DiffExpr.bhAdjustScalable(
        docs.filter(col("id") % 11 === i % 11), "p",
        Seq(col("id"))).count()
      persisted
    }
    assert(counts.last <= counts(4),
      s"rolling holds kept accumulating: $counts")
    assert(RelCache.liveRolling.getOrElse("diffexpr.bhadjust.base", 0) <= 4)
    RelCache.releaseAll()
    assert(persisted == 0, s"releaseAll left rolling blocks: ${RelCache.liveRolling}")
    assert(RelCache.liveRolling.values.sum == 0)
  }

  test("rolling same-plan re-hold keeps the shared cache entry live") {
    SparkEntry.clearQueryCaches()
    val docs = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").as("id"), (col("l_extendedprice") % 1.0).as("p"))
      .filter(col("id") < 500)
    def run() = graft.operators.DiffExpr.bhAdjustScalable(docs, "p", Seq(col("id")))
    run().count()
    val n1 = persisted
    val again = run()
    again.count()
    assert(persisted == n1, "identical-plan rolling re-hold changed the block set")
    val usesCache = again.queryExecution.executedPlan.toString
      .contains("InMemoryTableScan")
    assert(usesCache, "the re-invocation no longer reads the cached relation")
    RelCache.releaseAll()
    assert(persisted == 0)
  }

  test("winnowOverlap and containmentAgainstIndex hold and release their relations") {
    SparkEntry.clearQueryCaches()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 300)
    TextDedup.winnowOverlap(docs, k = 4, window = 4, minShared = 2,
      md5Hashes = true).count()
    assert(RelCache.liveSlots.contains("textdedup.winnowOverlap"))
    val ref = docs.filter(col("doc_id") % 7 < 3)
    val inc = docs.filter(col("doc_id") % 7 >= 3)
    val (fp, sizes) = TextDedup.winnowIndex(ref, k = 4, window = 4, md5Hashes = true)
    TextDedup.containmentAgainstIndex(inc, fp, sizes, k = 4, window = 4,
      minShared = 2, minContainment = 0.8, md5Hashes = true).count()
    assert(RelCache.liveSlots.contains("textdedup.containmentAgainstIndex"))
    RelCache.releaseAll()
    assert(persisted == 0 && RelCache.liveSlots.isEmpty)
  }
}
