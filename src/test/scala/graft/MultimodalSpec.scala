package graft

import graft.operators.Multimodal
import org.apache.spark.sql.Row

class MultimodalSpec extends SparkSpec {

  private def png(w: Int, h: Int, tpe: Int = java.awt.image.BufferedImage.TYPE_3BYTE_BGR): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, tpe)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 7 + y * 131) % 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def mediaDf = {
    val rows = Seq(
      Row(1L, "image", png(17, 9), Map("src" -> "cam0")),
      Row(2L, "image", null, Map.empty[String, String]),
      Row(3L, "video", Array.tabulate(30)(_.toByte), Map("fps" -> "24")),
      Row(4L, "image", Array[Byte](1, 2, 3, 4), Map.empty[String, String]),
      Row(5L, "image", png(5, 31, java.awt.image.BufferedImage.TYPE_4BYTE_ABGR),
        Map.empty[String, String]))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("decodeImages: REAL ImageIO dims for images, zeros for null/undecodable") {
    val out = Multimodal.decodeImages(mediaDf).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Int]("channels")))).toMap
    assert(out(1L) == ((17, 9, 3)), s"png roundtrip: ${out(1L)}")
    assert(out(2L) == ((0, 0, 0)))       // null payload -> zero dims
    assert(out(4L) == ((0, 0, 0)))       // garbage bytes -> zero dims, no crash
    assert(out(5L) == ((5, 31, 4)), s"alpha png: ${out(5L)}")    // 4 bands with alpha
    assert(out(3L)._1 >= 64)             // video keeps the declared stub path
  }

  private def be32(v: Long) = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be64(v: Long) = be32(v >> 32) ++ be32(v & 0xFFFFFFFFL)
  private def mp4Box(tp: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ tp.getBytes("US-ASCII") ++ payload
  private val unityMatrix = Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L,
    0x40000000L).flatMap(be32).toArray

  test("decodeVideoMeta: ISO-BMFF v0 AND v1 layouts, zeros for malformed input") {
    // v1 boxes widen the three time fields: mvhd ctime/mtime/duration
    // 8 bytes (timescale stays 4), tkhd ctime/mtime/duration 8 bytes
    val mvhdV1 = mp4Box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(90000) ++ be64(270000) ++ Array.fill(80)(0.toByte))      // 3 s at 90 kHz
    def tkhdV1(w: Long, h: Long) = mp4Box("tkhd",
      Array[Byte](1, 0, 0, 7) ++ be64(0) ++ be64(0) ++ be32(1) ++ be32(0) ++
        be64(270000) ++ be32(0) ++ be32(0) ++
        Array[Byte](0, 0, 0, 0, 1, 0, 0, 0) ++ unityMatrix ++
        be32(w << 16) ++ be32(h << 16))
    val mp4 = mp4Box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0x200)) ++
      mp4Box("moov", mvhdV1 ++ mp4Box("trak", tkhdV1(640, 360)) ++
        mp4Box("trak", tkhdV1(0, 0)))
    val m = Multimodal.decodeVideoMeta(mp4)
    assert(m == Multimodal.VideoMeta(640, 360, 3000L, 2), s"v1 parse: $m")
    // malformed payloads: truncated box, no ftyp, garbage, null, empty
    assert(Multimodal.decodeVideoMeta(mp4.take(20)) == Multimodal.VideoMeta(0, 0, 0L, 0))
    assert(Multimodal.decodeVideoMeta(mp4Box("moov", mvhdV1)) ==
      Multimodal.VideoMeta(0, 0, 0L, 0), "no ftyp -> not ISO-BMFF")
    assert(Multimodal.decodeVideoMeta(Array.tabulate(64)(_.toByte)) ==
      Multimodal.VideoMeta(0, 0, 0L, 0))
    assert(Multimodal.decodeVideoMeta(null) == Multimodal.VideoMeta(0, 0, 0L, 0))
    assert(Multimodal.decodeVideoMeta(Array.emptyByteArray) ==
      Multimodal.VideoMeta(0, 0, 0L, 0))
  }

  test("decodeVideo: header fields ride the media relation, zeros for non-video") {
    val tkhdV0 = mp4Box("tkhd", Array[Byte](0, 0, 0, 7) ++ be32(0) ++ be32(0) ++
      be32(1) ++ be32(0) ++ be32(2500) ++ be32(0) ++ be32(0) ++
      Array[Byte](0, 0, 0, 0, 1, 0, 0, 0) ++ unityMatrix ++
      be32(128L << 16) ++ be32(96L << 16))
    val mvhdV0 = mp4Box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(2500) ++ Array.fill(80)(0.toByte))
    val mp4 = mp4Box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0x200)) ++
      mp4Box("moov", mvhdV0 ++ mp4Box("trak", tkhdV0))
    val rows = Seq(
      Row(1L, "video", mp4, Map.empty[String, String]),
      Row(2L, "image", mp4, Map.empty[String, String]),   // wrong kind -> zeros
      Row(3L, "video", Array[Byte](9, 9, 9), Map.empty[String, String]))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows),
      Multimodal.mediaSchema)
    val out = Multimodal.decodeVideo(df).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Long]("duration_ms"), r.getAs[Int]("tracks")))).toMap
    assert(out(1L) == ((128, 96, 2500L, 1)), s"v0 parse: ${out(1L)}")
    assert(out(2L) == ((0, 0, 0L, 0)))
    assert(out(3L) == ((0, 0, 0L, 0)))
  }

  test("decodeAudio: REAL WAV header fields, zeros for non-audio kinds") {
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val pcm = Array.tabulate(120 * 2 * 2)(i => (i % 113).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 120L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val rows = Seq(
      Row(1L, "audio", bos.toByteArray, Map.empty[String, String]),
      Row(2L, "audio", Array[Byte](9, 9, 9), Map.empty[String, String]),
      Row(3L, "image", Array[Byte](1, 2), Map.empty[String, String]))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows),
      Multimodal.mediaSchema)
    val out = Multimodal.decodeAudio(df).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("sample_rate"), r.getAs[Int]("channels"), r.getAs[Long]("frames")))).toMap
    assert(out(1L) == ((16000, 2, 120L)), s"wav roundtrip: ${out(1L)}")
    assert(out(2L) == ((0, 0, 0L)))   // garbage bytes -> zeros, no crash
    assert(out(3L) == ((0, 0, 0L)))   // non-audio kind routed to zeros
  }

  test("resizeImages: aspect-preserving downscale, pass-through within bound, solid color survives") {
    def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      Row(1L, "image", solidPng(60, 30, 0x336699), Map.empty[String, String]),
      Row(2L, "image", solidPng(10, 8, 0xAA5511), Map.empty[String, String]), // within bound
      Row(3L, "image", null, Map.empty[String, String]))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows),
      Multimodal.mediaSchema)
    val out = Multimodal.resizeImages(df, maxDim = 24).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Int]("new_width"), r.getAs[Int]("new_height"),
          r.getAs[Array[Byte]]("resized")))).toMap
    assert(out(1L)._1 == 60 && out(1L)._2 == 30)
    assert(out(1L)._3 == 24 && out(1L)._4 == 12, s"got ${out(1L)}")
    // the resized payload is a real PNG of the target size, still solid
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L)._5))
    assert(dec.getWidth == 24 && dec.getHeight == 12)
    assert((dec.getRGB(11, 5) & 0xFFFFFF) == 0x336699,
      f"interior pixel 0x${dec.getRGB(11, 5) & 0xFFFFFF}%06X")
    // within-bound image passes through with its original bytes
    assert(out(2L)._3 == 10 && out(2L)._4 == 8)
    assert(java.util.Arrays.equals(out(2L)._5, solidPng(10, 8, 0xAA5511)))
    // failure contract
    assert(out(3L) == ((0, 0, 0, 0, null)))
  }

  test("extractFeatures emits fixed-dim float vectors") {
    val out = Multimodal.extractFeatures(mediaDf, dim = 8).collect()
    out.foreach { r =>
      assert(r.getSeq[Float](r.fieldIndex("features")).length == 8)
    }
  }

  private def le32(v: Long) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def aviChunk(id: String, payload: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ payload ++
      (if (payload.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
  private def aviList(tp: String, children: Array[Byte]): Array[Byte] =
    aviChunk("LIST", tp.getBytes("US-ASCII") ++ children)
  private def avi(children: Array[Byte]): Array[Byte] = {
    val body = "AVI ".getBytes("US-ASCII") ++ children
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  test("aviFrameBytes: RIFF walk finds dc/db chunks, honors rec-list nesting, padding, truncation") {
    val f0 = Array[Byte](1, 2, 3)                  // odd size -> pad byte after
    val f1 = Array[Byte](4, 5, 6, 7)
    val f2 = Array[Byte](8, 9)
    val audio = Array[Byte](99, 98)
    val container = avi(
      aviList("hdrl", aviChunk("avih", Array.fill(56)(0.toByte))) ++
        aviList("movi",
          aviChunk("00dc", f0) ++ aviChunk("01wb", audio) ++
            // interleave groups nest frames one LIST deeper
            aviList("rec ", aviChunk("00dc", f1)) ++ aviChunk("00db", f2)))
    val frames = Multimodal.aviFrameBytes(container)
    assert(frames.map(_.toSeq) == Seq(f0.toSeq, f1.toSeq, f2.toSeq),
      s"frame walk: ${frames.map(_.toSeq)}")
    // frames OUTSIDE movi (index/header chunks) are not frames
    val noMovi = avi(aviChunk("00dc", f0))
    assert(Multimodal.aviFrameBytes(noMovi).isEmpty)
    // truncation mid-chunk stops the walk with the frames seen so far
    val truncated = container.take(container.length - 3)
    assert(Multimodal.aviFrameBytes(truncated).map(_.toSeq) == Seq(f0.toSeq, f1.toSeq))
    // non-AVI payloads: wrong magic, null, empty
    assert(Multimodal.aviFrameBytes("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.aviFrameBytes(null).isEmpty)
    assert(Multimodal.aviFrameBytes(Array.emptyByteArray).isEmpty)
  }

  test("decodeFrames: REAL MJPEG-in-AVI frame decode with sampling") {
    def jpg(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 7) % 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val mjpeg = avi(aviList("movi",
      aviChunk("00dc", jpg(24, 16)) ++ aviChunk("00dc", jpg(32, 8)) ++
        aviChunk("00dc", jpg(40, 48))))
    val rows = Seq(
      Row(1L, "video", mjpeg, Map.empty[String, String]),
      Row(2L, "image", mjpeg, Map.empty[String, String]),  // wrong kind -> dropped
      Row(3L, "video", Array[Byte](1, 2, 3), Map.empty[String, String]))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows),
      Multimodal.mediaSchema)
    val all = Multimodal.decodeFrames(df).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("frame_idx"),
        r.getAs[Int]("n_frames"), r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Int]("channels"))).sorted.toSeq
    assert(all == Seq((1L, 0, 3, 24, 16, 3), (1L, 1, 3, 32, 8, 3),
      (1L, 2, 3, 40, 48, 3)), s"full decode: $all")
    val sampled = Multimodal.decodeFrames(df, every = 2).collect()
      .map(_.getAs[Int]("frame_idx")).sorted.toSeq
    assert(sampled == Seq(0, 2), s"every=2: $sampled")
  }

  test("gifFrames: REAL multi-frame LZW GIF decode, sampling, failure contract") {
    def gif(w: Int, h: Int, n: Int): Array[Byte] = Multimodal.checkerboardGif(w, h, n)
    val rows = Seq(
      Row(1L, "gif", gif(8, 6, 3), Map.empty[String, String]),
      Row(2L, "video", gif(8, 6, 3), Map.empty[String, String]), // wrong kind -> dropped
      Row(3L, "gif", Array[Byte](9, 9, 9), Map.empty[String, String])) // undecodable -> 0 rows
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows),
      Multimodal.mediaSchema)
    val all = Multimodal.gifFrames(df).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("frame_idx"),
        r.getAs[Int]("n_frames"), r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Double]("mean_lum"))).sorted.toSeq
    // 8x6 checkerboard: exactly half the cells are white every frame
    assert(all == Seq((1L, 0, 3, 8, 6, 127.5), (1L, 1, 3, 8, 6, 127.5),
      (1L, 2, 3, 8, 6, 127.5)), s"gif decode: $all")
    val sampled = Multimodal.gifFrames(df, every = 2).collect()
      .map(_.getAs[Int]("frame_idx")).sorted.toSeq
    assert(sampled == Seq(0, 2), s"every=2: $sampled")
  }

  test("sampleFrames explodes only videos into n frame rows") {
    val out = Multimodal.sampleFrames(mediaDf, n = 3).collect()
    assert(out.forall(_.getAs[String]("kind") == "video"))
    assert(out.length == 3)
    assert(out.map(_.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 1, 2))
  }
}
