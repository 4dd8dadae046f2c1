package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Third-party certification of the pure-JVM containers: the JDK's OWN
  * decoders (javax.imageio for BMP, javax.sound.sampled for WAV) must
  * accept every blob the encoders emit and read back the exact pixels/
  * samples. The m-gates already prove encode∘decode against the DuckDB
  * oracle, but both ends of that loop are ours — these tests close the
  * loop through decoders we did not write, so a container-layout bug
  * that our decoder compensates for cannot hide. */
class MultimodalInteropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val texts = Seq(
    1L -> "hello bitmap world, rows will wrap past one stride for sure",
    2L -> "",                          // empty text -> 1 all-zero row/sample-less
    3L -> "short",
    4L -> ("x" * 200),                 // several rows
    5L -> "café über bytes") // multi-byte UTF-8: formula is on BYTES

  private def docs = texts.toDF("doc_id", "text")

  test("encodeBmp blobs decode via the JDK's ImageIO with identical dimensions and channel sums") {
    javax.imageio.ImageIO.setUseCache(false)
    val blobs = Multimodal.encodeBmp(spark, docs, "doc_id", "text").collect()
    val ours = Multimodal.decodeBmp(spark,
      Multimodal.encodeBmp(spark, docs, "doc_id", "text"))
      .collect().map(d => d.id -> d).toMap
    assert(blobs.length == texts.length)
    blobs.foreach { m =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.blob))
      assert(img != null, s"id=${m.id}: the JDK's BMP reader rejected our container")
      val o = ours(m.id)
      assert(img.getWidth == o.width && img.getHeight == o.height,
        s"id=${m.id}: ImageIO sees ${img.getWidth}x${img.getHeight}, " +
          s"our decoder ${o.width}x${o.height}")
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
      }
      assert((sb, sg, sr) == (o.sum_b, o.sum_g, o.sum_r),
        s"id=${m.id}: ImageIO channel sums ($sb,$sg,$sr) != ours " +
          s"(${o.sum_b},${o.sum_g},${o.sum_r})")
    }
  }

  test("encodeWav blobs decode via the JDK's AudioSystem with identical format and samples") {
    val blobs = Multimodal.encodeWav(spark, docs, "doc_id", "text").collect()
    val expected = texts.toMap
    blobs.foreach { m =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(m.blob))
      val f = in.getFormat
      assert(f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
      assert(f.getSampleRate == 16000f && f.getChannels == 1 &&
        f.getSampleSizeInBits == 16 && !f.isBigEndian,
        s"id=${m.id}: unexpected format $f")
      val bytes = in.readAllBytes()
      val codes = expected(m.id).getBytes("UTF-8")
      assert(in.getFrameLength == codes.length,
        s"id=${m.id}: AudioSystem sees ${in.getFrameLength} frames, " +
          s"formula says ${codes.length}")
      assert(bytes.length == codes.length * 2)
      codes.zipWithIndex.foreach { case (c, i) =>
        val sample = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
        val want = (((c & 0xff) - 64) << 8).toShort
        assert(sample == want,
          s"id=${m.id} sample $i: AudioSystem read $sample, formula says $want")
      }
    }
  }
}
