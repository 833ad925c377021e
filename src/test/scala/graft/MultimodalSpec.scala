package graft

import graft.operators.Multimodal
import org.apache.spark.sql.Row

class MultimodalSpec extends SparkSpec {

  private def mediaDf = {
    val rows = Seq(
      Row(1L, "image", Array[Byte](1, 2, 3, 4), Map("src" -> "cam0")),
      Row(2L, "image", null, Map.empty[String, String]),
      Row(3L, "video", Array.tabulate(30)(_.toByte), Map("fps" -> "24")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("decodeImages adds deterministic dimensions and handles null payloads") {
    val out = Multimodal.decodeImages(mediaDf).collect()
      .map(r => r.getAs[Long]("media_id") -> (r.getAs[Int]("width"), r.getAs[Int]("channels"))).toMap
    assert(out(2L) == (0, 0))            // null payload -> zero dims
    assert(out(1L)._1 >= 64 && out(1L)._2 == 3)
    // determinism: same bytes, same dims on re-run
    val again = Multimodal.decodeImages(mediaDf).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Int]("width")).toMap
    assert(again(1L) == out(1L)._1)
  }

  test("extractFeatures emits fixed-dim float vectors") {
    val out = Multimodal.extractFeatures(mediaDf, dim = 8).collect()
    out.foreach { r =>
      assert(r.getSeq[Float](r.fieldIndex("features")).length == 8)
    }
  }

  test("sampleFrames explodes only videos into n frame rows") {
    val out = Multimodal.sampleFrames(mediaDf, n = 3).collect()
    assert(out.forall(_.getAs[String]("kind") == "video"))
    assert(out.length == 3)
    assert(out.map(_.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 1, 2))
  }
}
