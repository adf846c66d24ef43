package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, LongType}

/** Native image codec expressions over the JDK's own `javax.imageio`
  * (PNG / BMP / GIF readers and writers ship in every JRE - zero
  * external dependencies). These close the image leg of the multimodal
  * codec: [[ImageLumaGrid]] REALLY decodes the binary payload and
  * extracts the block-mean luma grid a DCT-family perceptual hash
  * thresholds, and [[GrayImageEncode]] renders deterministic grayscale
  * fixtures THROUGH a real encoder, so the decode path is exercised by
  * genuine codec bytes (not hand-built arrays).
  *
  * Scale shape: both are per-row map work inside whole-stage codegen -
  * no shuffle, no driver state, embarrassingly parallel across a
  * 1000-executor scan. The audio leg is equally real (WAV/AIFF PCM via
  * `javax.sound`, [[graft.functions.PcmAudioGrid]]) and uncompressed
  * RIFF/AVI video decodes through [[graft.functions.AviFrameLumaGrids]];
  * COMPRESSED video is the one remaining stub (no JVM codec in the
  * toolchain) - the capability map lives in [[graft.llm.Multimodal]].
  */

/** Renders a `w` x `h` 8-bit grayscale image with
  * `luma(x, y) = base + xStep * x + yStep * y` and encodes it with the
  * JDK `format` writer ("png" or "bmp"). The linear-gradient pattern
  * is chosen because its block-mean grid has an exact integer closed
  * form (see [[ImageLumaGrid]]), so an external engine can verify the
  * full encode -> decode -> feature chain arithmetically without any
  * image library. Children (base, xStep, yStep) are per-row ints;
  * every pixel must land in [0, 255] or the render fails loudly
  * (clamping would silently break the closed form).
  */
case class GrayImageEncode(base: Expression, xStep: Expression,
                           yStep: Expression, w: Int, h: Int,
                           format: String) extends TernaryExpression {

  require(w > 0 && h > 0, s"image dims ${w}x$h must be positive")
  require(GrayImageEncode.Formats.contains(format),
    s"format '$format' not in ${GrayImageEncode.Formats}")

  override def first: Expression = base
  override def second: Expression = xStep
  override def third: Expression = yStep
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(b: Any, xs: Any, ys: Any): Any =
    GrayImageEncode.compute(b.asInstanceOf[Int], xs.asInstanceOf[Int],
      ys.asInstanceOf[Int], w, h, format)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, xs, ys) =>
      s"""graft.functions.GrayImageEncode.compute($b, $xs, $ys, $w, $h, "$format")""")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(base = newFirst, xStep = newSecond, yStep = newThird)

  override def prettyName: String = "gray_image_encode"
}

object GrayImageEncode {
  val Formats: Set[String] = Set("png", "bmp", "gif")

  def compute(base: Int, xStep: Int, yStep: Int, w: Int, h: Int,
              format: String): Array[Byte] = {
    // extremes are per-axis: a negative step contributes 0 to the max
    // and its full span to the min (the old base + xSpan + ySpan form
    // underestimated the max under mixed signs, letting >255 pixels
    // through to setSample's silent mod-256 truncation)
    val maxLuma = base.toLong + math.max(0, xStep.toLong * (w - 1)) +
      math.max(0, yStep.toLong * (h - 1))
    val minLuma = base.toLong + math.min(0, xStep.toLong * (w - 1)) +
      math.min(0, yStep.toLong * (h - 1))
    require(minLuma >= 0 && maxLuma <= 255,
      s"gray_image_encode: luma range [$minLuma, $maxLuma] outside [0, 255] " +
        s"for base=$base xStep=$xStep yStep=$yStep ${w}x$h - clamping would " +
        "break the closed-form feature oracle")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, base + xStep * x + yStep * y)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream(256)
    val ok = ImageIO.write(img, format, out)
    require(ok, s"gray_image_encode: no JDK writer for format '$format'")
    out.toByteArray
  }
}

/** Renders a `w` x `h` 8-bit grayscale BLOCK-NOISE image through a real
  * JDK encoder: the pixel grid splits into `block` x `block` cells and
  * every pixel of cell index i (row-major over cells) has
  * luma = the unsigned FIRST MD5 BYTE of "seed|i". Unlike the linear
  * gradient (whose pHash collapses to ~|orientations| distinct values -
  * brightness invariance erases the base term) or any low-modulus
  * arithmetic pattern (an affine (a*seed + b*i) mod m scheme admits
  * only m distinct images, so a corpus-wide pairs query degenerates
  * quadratically - measured: 8k chance pairs on 500 docs under
  * mod-251), the md5 byte gives each seed 64 independent-looking
  * features and an effectively unique 64-bit pHash. A corpus-wide
  * near-dup query therefore stays SPARSE: only planted same-seed
  * re-encodes land within a small Hamming radius - the diversity
  * contract the md5-stub pairs query relies on, now through genuine
  * codec bytes, and still exactly replayable by any engine with md5
  * (block mean = cell luma when cell size = feature block size).
  */
case class GrayBlockImageEncode(seed: Expression, w: Int, h: Int,
                                block: Int, format: String)
    extends UnaryExpression {

  require(w > 0 && h > 0, s"image dims ${w}x$h must be positive")
  require(block > 0 && w % block == 0 && h % block == 0,
    s"block $block must divide ${w}x$h")
  require(GrayImageEncode.Formats.contains(format),
    s"format '$format' not in ${GrayImageEncode.Formats}")

  override def child: Expression = seed
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(s: Any): Any =
    GrayBlockImageEncode.compute(s.asInstanceOf[Long], w, h, block, format)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"""graft.functions.GrayBlockImageEncode.compute($s, $w, $h, $block, "$format")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(seed = newChild)

  override def prettyName: String = "gray_block_image_encode"
}

object GrayBlockImageEncode {
  def compute(seed: Long, w: Int, h: Int, block: Int,
              format: String): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val cellsPerRow = w / block
    val nCells = cellsPerRow * (h / block)
    // cell luma = unsigned first md5 byte of "seed|cell" - matches the
    // external replay ('0x' || substr(md5(seed || '|' || i), 1, 2))
    val lumas = new Array[Int](nCells)
    var c = 0
    while (c < nCells) {
      md.reset()
      lumas(c) = md.digest(
        (seed.toString + "|" + c).getBytes("UTF-8"))(0) & 0xFF
      c += 1
    }
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0,
          lumas((y / block) * cellsPerRow + (x / block)))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream(256)
    val ok = ImageIO.write(img, format, out)
    require(ok, s"gray_block_image_encode: no JDK writer for format '$format'")
    out.toByteArray
  }
}

/** REAL image decode + feature extraction: reads the binary payload
  * with `javax.imageio` (PNG, BMP, GIF - whatever reader the JDK
  * resolves for the bytes), partitions the pixel grid into
  * `grid` x `grid` blocks, and returns the `grid`^2 per-block mean
  * lumas (row-major: index = blockRow * grid + blockCol) as integers -
  * the feature vector a DCT-family perceptual hash thresholds.
  *
  * Exact integer contract (what makes the chain oracle-able):
  * block (gx, gy) covers pixel columns [gx*w/grid, (gx+1)*w/grid) and
  * rows [gy*h/grid, (gy+1)*h/grid) (integer division); the feature is
  * floor(sum of block lumas / block pixel count). Luma is the raw
  * sample for single-band (grayscale) images and the integer BT.601
  * mix (299r + 587g + 114b) / 1000 for RGB - re-encodes that preserve
  * gray pixels (r = g = b) produce identical features under either
  * branch, which is exactly the cross-codec agreement the near-dup
  * pairs query plants.
  *
  * Undecodable bytes FAIL LOUDLY (a corrupt asset must not silently
  * hash like an all-zero image); screen with [[ImageDecodable]] first
  * when the corpus may contain junk. Dimensions smaller than `grid`
  * fail too - there is no honest 64-feature grid of a 4x4 image.
  */
case class ImageLumaGrid(child: Expression, grid: Int)
    extends UnaryExpression {

  require(grid >= 1 && grid <= 64, s"grid $grid outside [1, 64]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ImageLumaGrid.compute(input.asInstanceOf[Array[Byte]], grid)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ImageLumaGrid.compute($c, $grid)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "image_luma_grid"
}

object ImageLumaGrid {

  // ImageIO's default ImageInputStream cache is DISK-backed: every
  // decode call creates (and fsyncs away) a temp cache file, which at
  // corpus scale turns a CPU-bound map stage into an I/O storm
  // (measured: the AVI frame pipeline spent most of its time here).
  // In-memory payloads never need the disk cache.
  javax.imageio.ImageIO.setUseCache(false)

  def compute(bytes: Array[Byte], grid: Int): ArrayData = {
    val img = decode(bytes)
    require(img != null,
      "image_luma_grid: undecodable image bytes (no JDK reader matched); " +
        "screen with image_decodable first if the corpus may contain junk")
    computeFrom(img, grid)
  }

  /** The grid math over an already-decoded image (the AVI frame path
    * decodes through its own cached BMP reader). */
  private[functions] def computeFrom(img: BufferedImage, grid: Int): ArrayData = {
    val w = img.getWidth
    val h = img.getHeight
    require(w >= grid && h >= grid,
      s"image_luma_grid: image ${w}x$h smaller than the ${grid}x$grid grid")
    val raster = img.getRaster
    // palette-indexed rasters (GIF, 8-bit palette BMP) store palette
    // INDICES, not luma - those must route through the RGB lookup
    val indexed =
      img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
    val directSample = raster.getNumBands == 1 && !indexed
    val out = new Array[Long](grid * grid)
    var gy = 0
    while (gy < grid) {
      val y0 = gy * h / grid
      val y1 = (gy + 1) * h / grid
      var gx = 0
      while (gx < grid) {
        val x0 = gx * w / grid
        val x1 = (gx + 1) * w / grid
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val luma =
              if (directSample) raster.getSample(x, y, 0)
              else {
                val rgb = img.getRGB(x, y)
                (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
                  114 * (rgb & 0xFF)) / 1000
              }
            sum += luma
            x += 1
          }
          y += 1
        }
        out(gy * grid + gx) = sum / ((y1 - y0).toLong * (x1 - x0))
        gx += 1
      }
      gy += 1
    }
    new GenericArrayData(out)
  }

  private[functions] def decode(bytes: Array[Byte]): BufferedImage =
    try ImageIO.read(new ByteArrayInputStream(bytes))
    catch { case _: Exception => null }
}

/** True iff the JDK can decode `bytes` as an image - the screening
  * predicate in front of [[ImageLumaGrid]] for corpora that may carry
  * corrupt or non-image payloads (decode work is paid once per asset
  * either way at the scan; junk rows route to a quarantine sink
  * instead of failing the job). */
case class ImageDecodable(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(input: Any): Any =
    ImageLumaGrid.decode(input.asInstanceOf[Array[Byte]]) != null

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(graft.functions.ImageLumaGrid.decode($c) != null)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "image_decodable"
}
