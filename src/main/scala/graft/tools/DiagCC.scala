package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing diagnostic for the star-contraction kernel (round 15):
  * splits [[graft.operators.TextDedup.duplicateComponents]]' wall into
  * the iterative closure (runs during DataFrame construction) and the
  * final labeling evaluation, so the chaincc/q175 latency floor is
  * attributable. Dev-only; not on any bench or correctness path. */
object DiagCC {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(300000L)
    val spark = graft.model.SessionTuning.tuned(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    if (args.drop(1).headOption.contains("q175")) {
      // replay the q175 shape with phase walls: base closure, upsert
      // closure, final evaluation
      val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val o = spark.read.parquet(s"$dir/orders.parquet").select(col("o_orderkey"))
      val pairs = o.as("a").join(o.as("b"),
          col("b.o_orderkey") === col("a.o_orderkey") + 1)
        .filter(col("b.o_orderkey") % 50 =!= 0)
        .select(col("b.o_orderkey").as("id_a"), col("a.o_orderkey").as("id_b"))
      val batch1 = pairs.filter(col("id_b") % 2 === 0)
      val batch2 = pairs.filter(col("id_b") % 2 =!= 0)
      val t0 = System.nanoTime()
      val base = graft.operators.TextDedup.duplicateComponents(batch1)
      val t1 = System.nanoTime()
      val up = graft.operators.TextDedup.componentsUpsert(base, batch2)
      val t2 = System.nanoTime()
      val nOut = up.count()
      val t3 = System.nanoTime()
      println(f"[diagcc] q175: base=${(t1 - t0) / 1e9}%.2fs upsert=${(t2 - t1) / 1e9}%.2fs " +
        f"final-eval=${(t3 - t2) / 1e9}%.2fs total=${(t3 - t0) / 1e9}%.2fs n=$nOut")
      return
    }
    val pairs = spark.range(1L, n)
      .select((col("id") + 1L).as("id_a"), col("id").as("id_b"))

    val t0 = System.nanoTime()
    val labels = graft.operators.TextDedup.duplicateComponents(pairs)
    val t1 = System.nanoTime()
    val row = labels.agg(max(col("component")), count(lit(1))).head()
    val t2 = System.nanoTime()
    println(f"[diagcc] loop=${(t1 - t0) / 1e9}%.2fs final-eval=${(t2 - t1) / 1e9}%.2fs " +
      f"total=${(t2 - t0) / 1e9}%.2fs max=${row.getLong(0)} n=${row.getLong(1)}")
  }
}
