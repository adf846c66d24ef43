package graft

import org.apache.spark.sql.functions._
import graft.llm.Multimodal

/** The video container leg: RIFF/AVI walk + JDK BMP frame decode.
  * Pins the per-frame closed form, real frame sampling, and the
  * quarantine/fail-loud behavior on junk and non-video payloads. */
class MultimodalVideoSpec extends SparkSpec {
  import spark.implicits._

  private def md5Byte(s: String): Int =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))(0) & 0xFF

  private def assets = Seq(7L, 21L).toDF("asset_id")
    .withColumn("bytes",
      Multimodal.blockNoiseAviBytes($"asset_id", 16, 16, 2, frames = 4))

  test("every decoded AVI frame's 8x8 grid equals the closed form " +
    "md5Byte(seed|f|i), through the independent JDK BMP decoder") {
    val got = assets
      .select($"asset_id", Multimodal.videoFrameFeatures($"bytes").as("fs"))
      .as[(Long, Seq[Seq[Long]])].collect()
    assert(got.length == 2)
    got.foreach { case (seed, frames) =>
      assert(frames.size == 4)
      for (f <- 0 until 4; i <- 0 until 64)
        assert(frames(f)(i) == md5Byte(s"$seed|$f|$i").toLong,
          s"seed=$seed frame=$f cell=$i")
    }
  }

  test("sampleFramesDecoded keeps every k-th frame with a per-frame " +
    "pHash; distinct frames hash apart") {
    val rows = Multimodal.sampleFramesDecoded(assets, every = 2)
      .select($"asset_id", $"frame_idx", $"frame_phash")
      .as[(Long, Int, Long)].collect()
    assert(rows.map(r => (r._1, r._2)).toSet ==
      Set((7L, 0), (7L, 2), (21L, 0), (21L, 2)))
    // block-noise frames are independent draws: their hashes differ
    assert(rows.map(_._3).distinct.length == 4)
  }

  test("quarantine: junk and non-AVI media are not video; the decoder " +
    "fails loudly on them") {
    val junk = Seq(
      (1L, "not a movie".getBytes("UTF-8")),
      (2L, graft.functions.GrayImageEncode.compute(10, 3, 2, 16, 16, "png"))
    ).toDF("asset_id", "bytes")
    val dec = junk.select($"asset_id", Multimodal.videoDecodable($"bytes"))
      .as[(Long, Boolean)].collect().toMap
    assert(dec == Map(1L -> false, 2L -> false))
    assert(assets.select(Multimodal.videoDecodable($"bytes"))
      .as[Boolean].collect().forall(identity))
    val e = intercept[Exception] {
      junk.select(Multimodal.videoFrameFeatures($"bytes")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not a parseable uncompressed AVI")), e)
  }
}
