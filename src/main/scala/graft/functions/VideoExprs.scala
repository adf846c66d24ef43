package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, LongType}

/** VIDEO container expressions over uncompressed RIFF/AVI - the last
  * multimodal leg, at the honest level the JRE supports: there is no
  * JDK video CODEC, but uncompressed AVI ("DIB"/BI_RGB '00db' frames,
  * the Video-for-Windows baseline every player accepts) needs only a
  * RIFF container walk, and each extracted frame IS a device-
  * independent bitmap that the JDK's own BMP reader decodes once
  * wrapped with a 14-byte BITMAPFILEHEADER. So the frame-decode step
  * rides the real, independently-implemented `javax.imageio` codec
  * (the same reader [[ImageLumaGrid]] uses); only the container
  * traversal (RIFF chunk walk, hdrl/strf stream format, movi frame
  * chunks) is implemented here - which is exactly the part a video
  * pipeline owns even when it delegates codecs.
  *
  * Compressed codecs (H.264 etc.) remain out of scope - no JRE
  * decoder - and that residual gap is documented at the call sites in
  * [[graft.llm.Multimodal]].
  */

/** Renders an uncompressed AVI: `frames` frames of `w` x `h` 24-bit
  * BI_RGB gray pixels (r = g = b), where frame f's `block` x `block`
  * cell i has luma = the unsigned first md5 byte of "seed|f|i" - the
  * per-frame twin of [[GrayBlockImageEncode]]'s pattern, so every
  * (seed, frame) pair fingerprints uniquely and the per-cell mean
  * replays exactly in any engine with md5 (BT.601 of r=g=b is the
  * identity: (299v + 587v + 114v) / 1000 = v). Container layout:
  * RIFF('AVI ' LIST('hdrl' avih, LIST('strl' strh 'vids'/'DIB ',
  * strf BITMAPINFOHEADER)) LIST('movi' '00db' x frames)) - the
  * canonical index-less uncompressed AVI. */
case class AviDibEncode(seed: Expression, w: Int, h: Int, block: Int,
                        frames: Int) extends UnaryExpression {

  require(w > 0 && h > 0 && w % 4 == 0,
    s"frame dims ${w}x$h must be positive with width a multiple of 4 " +
      "(24-bit rows pad to 4 bytes; a multiple-of-4 width keeps the " +
      "pixel math padding-free)")
  require(block > 0 && w % block == 0 && h % block == 0,
    s"block $block must divide ${w}x$h")
  require(frames >= 1 && frames <= 64, s"frames $frames outside [1, 64]")

  override def child: Expression = seed
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(s: Any): Any =
    AviDibEncode.compute(s.asInstanceOf[Long], w, h, block, frames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.AviDibEncode.compute($s, $w, $h, $block, $frames)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(seed = newChild)

  override def prettyName: String = "avi_dib_encode"
}

object AviDibEncode {

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  /** The 40-byte BITMAPINFOHEADER for w x h 24-bit BI_RGB. */
  private[functions] def bmpInfoHeader(w: Int, h: Int, sizeImage: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream(40)
    o.write(le32(40)); o.write(le32(w)); o.write(le32(h))
    o.write(le16(1)); o.write(le16(24)) // planes, bpp
    o.write(le32(0)) // BI_RGB
    o.write(le32(sizeImage))
    o.write(le32(2835)); o.write(le32(2835)) // 72 dpi
    o.write(le32(0)); o.write(le32(0)) // palette
    o.toByteArray
  }

  def compute(seed: Long, w: Int, h: Int, block: Int,
              frames: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val cellsPerRow = w / block
    val frameSize = w * h * 3 // width multiple of 4 => no row padding
    def frame(f: Int): Array[Byte] = {
      val px = new Array[Byte](frameSize)
      val lumas = new Array[Byte](cellsPerRow * (h / block))
      var c = 0
      while (c < lumas.length) {
        md.reset()
        lumas(c) = md.digest(
          (seed.toString + "|" + f + "|" + c).getBytes("UTF-8"))(0)
        c += 1
      }
      var y = 0
      while (y < h) {
        // DIB rows are BOTTOM-UP: buffer row index h-1-y holds image row y
        val rowOff = (h - 1 - y) * w * 3
        var x = 0
        while (x < w) {
          val v = lumas((y / block) * cellsPerRow + (x / block))
          val k = rowOff + x * 3
          px(k) = v; px(k + 1) = v; px(k + 2) = v // b, g, r equal
          x += 1
        }
        y += 1
      }
      px
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream(body.length + 8)
      o.write(id.getBytes("US-ASCII")); o.write(le32(body.length))
      o.write(body)
      if (body.length % 2 == 1) o.write(0) // RIFF chunks pad to even
      o.toByteArray
    }
    def list(tpe: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream(body.length + 12)
      o.write("LIST".getBytes("US-ASCII")); o.write(le32(body.length + 4))
      o.write(tpe.getBytes("US-ASCII")); o.write(body)
      o.toByteArray
    }
    val avih = {
      val o = new ByteArrayOutputStream(56)
      o.write(le32(100000)) // usec per frame (10 fps)
      o.write(le32(frameSize * 10)); o.write(le32(0))
      o.write(le32(0)) // flags: no idx1 chunk, so AVIF_HASINDEX stays off
      o.write(le32(frames)); o.write(le32(0))
      o.write(le32(1)) // streams
      o.write(le32(frameSize))
      o.write(le32(w)); o.write(le32(h))
      o.write(le32(0)); o.write(le32(0)); o.write(le32(0)); o.write(le32(0))
      o.toByteArray
    }
    val strh = {
      val o = new ByteArrayOutputStream(56)
      o.write("vids".getBytes("US-ASCII"))
      o.write("DIB ".getBytes("US-ASCII"))
      o.write(le32(0)); o.write(le16(0)); o.write(le16(0))
      o.write(le32(0))
      o.write(le32(1)); o.write(le32(10)) // scale 1, rate 10 => 10 fps
      o.write(le32(0)); o.write(le32(frames))
      o.write(le32(frameSize)); o.write(le32(-1))
      o.write(le32(frameSize))
      o.write(le16(0)); o.write(le16(0)); o.write(le16(w)); o.write(le16(h))
      o.toByteArray
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++
        chunk("strf", bmpInfoHeader(w, h, frameSize))))
    val movi = list("movi",
      (0 until frames).map(f => chunk("00db", frame(f)))
        .foldLeft(Array.emptyByteArray)(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = new ByteArrayOutputStream(body.length + 8)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(body.length))
    out.write(body)
    out.toByteArray
  }
}

/** REAL frame extraction + decode from an uncompressed AVI payload:
  * walks the RIFF container (hdrl -> strf for the stream's
  * BITMAPINFOHEADER, movi -> the '00db'/'00dc' frame chunks), wraps
  * each frame's DIB bits with a BITMAPFILEHEADER, and decodes it with
  * the JDK's own BMP reader ([[ImageLumaGrid]]'s codec - an
  * INDEPENDENT implementation of the pixel format, not a replay of
  * the writer), returning one `grid` x `grid` block-mean luma vector
  * per frame (frames in stream order; row-major grids, the
  * [[ImageLumaGrid]] contract). Fails loudly on payloads that are not
  * parseable uncompressed AVI; screen with [[AviDecodable]]. */
case class AviFrameLumaGrids(child: Expression, grid: Int)
    extends UnaryExpression {

  require(grid >= 1 && grid <= 64, s"grid $grid outside [1, 64]")

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    AviFrameLumaGrids.compute(input.asInstanceOf[Array[Byte]], grid)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AviFrameLumaGrids.compute($c, $grid)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "avi_frame_luma_grids"
}

object AviFrameLumaGrids {

  // per-thread cached JDK BMP ImageReader: frame decode is per-row hot
  // work and ImageIO.read's per-call reader lookup + stream plumbing
  // is measurable at 4 frames/asset; ImageReader reuse via setInput is
  // the documented javax.imageio pattern
  private val bmpReader =
    ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
      javax.imageio.ImageIO.getImageReadersByFormatName("bmp").next())

  private def decodeBmp(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val r = bmpReader.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      r.setInput(iis)
      r.read(0)
    } finally iis.close()
  }

  private def u32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** (video strf BITMAPINFOHEADER bytes, that stream's frame payloads
    * in order), or null when the payload is not a parseable
    * uncompressed AVI. Multi-stream safe: the strf is taken from the
    * FIRST 'strl' whose strh declares fccType 'vids' (an audio strl
    * listed first - the common mux order - no longer captures the
    * header slot), and movi chunks are kept only when their two-digit
    * stream-number prefix ('NNdb'/'NNdc') equals that strl's ordinal,
    * so audio packets and any second video stream's frames never
    * interleave into the decoded sequence.
    *
    * Single-stream leniency: a spec-sloppy AVI that writes NO strh
    * chunk anywhere (so no stream declares a type at all) falls back
    * to the first strf and accepts its frame chunks - but ONLY when
    * the file is observably single-stream: exactly one strf in hdrl
    * and every NNdb/NNdc chunk carrying the same stream-number
    * prefix. A strh-less file with two strfs, or with frame chunks
    * under two different stream numbers, is genuinely ambiguous (the
    * first strf may not describe the frames; two streams' payloads
    * would interleave into one garbage grid sequence) and stays
    * null. A file that DOES declare strh types but none of them
    * 'vids' also stays null: it told us it has no video stream. */
  private[functions] def parse(b: Array[Byte]): (Array[Byte], Seq[Array[Byte]]) = {
    try {
      if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
        return null
      var strf: Array[Byte] = null
      var firstStrf: Array[Byte] = null // strh-less fallback candidate
      var strfCount = 0 // leniency gate: >1 strf = not observably single-stream
      var sawStrh = false
      var videoStream = -1 // ordinal of the first 'vids' strl in hdrl
      var strlOrdinal = -1 // ordinal of the strl being walked
      var curFccType: String = null // fccType from the current strl's strh
      var lenientSn = -1 // stream-number prefix accepted by the leniency
      var mixedSn = false // two distinct prefixes seen = ambiguous
      val frames = Seq.newBuilder[Array[Byte]]
      def walk(off0: Int, end: Int): Unit = {
        var off = off0
        while (off + 8 <= end) {
          val id = fourcc(b, off)
          val sz = u32(b, off + 4)
          if (sz < 0 || off + 8 + sz > end) return
          if (id == "LIST") {
            if (sz >= 4 && fourcc(b, off + 8) == "strl") {
              strlOrdinal += 1; curFccType = null
            }
            walk(off + 12, off + 8 + sz) // skip the 4-byte list type
          } else if (id == "strh" && sz >= 4) {
            sawStrh = true
            curFccType = fourcc(b, off + 8)
          } else if (id == "strf") {
            strfCount += 1
            if (firstStrf == null)
              firstStrf = java.util.Arrays.copyOfRange(b, off + 8, off + 8 + sz)
            if (videoStream < 0 && curFccType == "vids") {
              videoStream = strlOrdinal
              strf = java.util.Arrays.copyOfRange(b, off + 8, off + 8 + sz)
            }
          } else if (id.substring(2) == "db" || id.substring(2) == "dc") {
            // hdrl precedes movi, so videoStream (and sawStrh) are
            // final before any frame chunk; the prefix is the stream
            // number in ASCII. Keep only the bound video stream's
            // frames - or, strh-less leniency, every frame when no
            // stream declared a type - so a losing stream's payloads
            // are never copied just to be discarded post-walk.
            val sn = try Integer.parseInt(id.substring(0, 2))
                     catch { case _: NumberFormatException => -2 }
            if (sn >= 0 &&
                (if (videoStream >= 0) sn == videoStream else !sawStrh)) {
              // strh-less path: remember which prefix the leniency is
              // collecting; a second distinct prefix voids it post-walk
              if (videoStream < 0) {
                if (lenientSn < 0) lenientSn = sn
                else if (lenientSn != sn) mixedSn = true
              }
              frames += java.util.Arrays.copyOfRange(b, off + 8, off + 8 + sz)
            }
          }
          off += 8 + sz + (sz & 1) // RIFF even padding
        }
      }
      walk(12, math.min(b.length, 8 + u32(b, 4)))
      val fs = frames.result()
      if (videoStream >= 0) {
        if (strf == null || fs.isEmpty) null else (strf, fs)
      } else if (!sawStrh && strfCount == 1 && !mixedSn &&
                 firstStrf != null && fs.nonEmpty) {
        (firstStrf, fs) // strh-less OBSERVABLY-single-stream leniency
      } else null
    } catch { case _: Exception => null }
  }

  def compute(bytes: Array[Byte], grid: Int): ArrayData = {
    val parsed = parse(bytes)
    require(parsed != null,
      "avi_frame_luma_grids: not a parseable uncompressed AVI " +
        "(RIFF/AVI + strf + movi frames required); screen with " +
        "avi_decodable first if the corpus may contain junk")
    val (strf, frames) = parsed
    val out = frames.map { px =>
      // BITMAPFILEHEADER (14 bytes) + the stream's own infoheader +
      // pixel bits = a complete BMP for the independent JDK decoder
      val total = 14 + strf.length + px.length
      val bmp = new ByteArrayOutputStream(total)
      bmp.write('B'); bmp.write('M')
      bmp.write(Array((total & 0xFF).toByte, ((total >> 8) & 0xFF).toByte,
        ((total >> 16) & 0xFF).toByte, ((total >> 24) & 0xFF).toByte))
      bmp.write(Array[Byte](0, 0, 0, 0))
      val off = 14 + strf.length
      bmp.write(Array((off & 0xFF).toByte, ((off >> 8) & 0xFF).toByte,
        ((off >> 16) & 0xFF).toByte, ((off >> 24) & 0xFF).toByte))
      bmp.write(strf); bmp.write(px)
      ImageLumaGrid.computeFrom(decodeBmp(bmp.toByteArray), grid)
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** True iff the payload parses as an uncompressed AVI with at least
  * one frame - the quarantine predicate for [[AviFrameLumaGrids]]. */
case class AviDecodable(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(input: Any): Any =
    AviFrameLumaGrids.parse(input.asInstanceOf[Array[Byte]]) != null

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(graft.functions.AviFrameLumaGrids.parse($c) != null)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "avi_decodable"
}
