package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, LongType}

/** Native AUDIO codec expressions over the JDK's own
  * `javax.sound.sampled` (WAV and AIFF PCM readers/writers ship in
  * every JRE - zero external dependencies), closing the audio leg of
  * the multimodal codec the way ImageExprs closed the image leg:
  * [[PcmAudioGrid]] REALLY decodes the payload (container parse,
  * endianness, sample width all handled by the real codec) and
  * extracts the per-window mean-absolute-amplitude grid an audio
  * fingerprint thresholds, and [[BlockToneAudioEncode]] renders
  * deterministic PCM fixtures THROUGH a real encoder. WAV is
  * little-endian PCM, AIFF is big-endian: the same samples encoded
  * through both exercise two genuinely different on-disk formats that
  * must decode identically - the audio twin of the PNG-vs-BMP
  * cross-codec pair test.
  *
  * Scale shape: per-row map work inside whole-stage codegen - no
  * shuffle, no driver state. The image leg ([[ImageLumaGrid]]) and the
  * uncompressed RIFF/AVI video leg ([[AviFrameLumaGrids]]) are equally
  * real; COMPRESSED video is the one remaining stub (no JVM codec in
  * the toolchain) - the capability map lives in [[graft.llm.Multimodal]].
  */

/** Renders mono 16-bit PCM with BLOCK-CONSTANT amplitude through a real
  * JDK encoder ("wav" or "aiff"): the `nBlocks * blockLen` samples are
  * split into blocks and every sample of block i has amplitude
  * (md5Byte("seed|i") - 128) * 256 (md5Byte = the unsigned first md5
  * byte, so amplitudes span [-32768, 32512) deterministically and each
  * seed gets an effectively unique fingerprint). With feature windows
  * aligned to blocks, the per-window mean |amplitude| has an exact
  * integer closed form any engine with md5 replays:
  * |(byte - 128) * 256|.
  */
case class BlockToneAudioEncode(seed: Expression, nBlocks: Int,
                                blockLen: Int, format: String)
    extends UnaryExpression {

  require(nBlocks > 0 && blockLen > 0,
    s"nBlocks=$nBlocks blockLen=$blockLen must be positive")
  require(BlockToneAudioEncode.Formats.contains(format),
    s"format '$format' not in ${BlockToneAudioEncode.Formats}")

  override def child: Expression = seed
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(s: Any): Any =
    BlockToneAudioEncode.compute(s.asInstanceOf[Long], nBlocks, blockLen,
      format)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"""graft.functions.BlockToneAudioEncode.compute($s, $nBlocks, $blockLen, "$format")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(seed = newChild)

  override def prettyName: String = "block_tone_audio_encode"
}

object BlockToneAudioEncode {
  val Formats: Set[String] = Set("wav", "aiff")

  def compute(seed: Long, nBlocks: Int, blockLen: Int,
              format: String): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = nBlocks * blockLen
    // samples little-endian in the intermediate buffer; the JDK
    // encoder re-packs per container (AIFF flips to big-endian)
    val pcm = new Array[Byte](n * 2)
    var b = 0
    while (b < nBlocks) {
      md.reset()
      val amp = ((md.digest(
        (seed.toString + "|" + b).getBytes("UTF-8"))(0) & 0xFF) - 128) * 256
      var j = 0
      while (j < blockLen) {
        val k = (b * blockLen + j) * 2
        pcm(k) = (amp & 0xFF).toByte
        pcm(k + 1) = ((amp >> 8) & 0xFF).toByte
        j += 1
      }
      b += 1
    }
    val fmt = new AudioFormat(16000f, 16, 1, true, false) // PCM16 mono LE
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream(n * 2 + 64)
    val tpe = if (format == "wav") AudioFileFormat.Type.WAVE
              else AudioFileFormat.Type.AIFF
    // cached SPI writers: AudioSystem.write goes through the same
    // synchronized provider registry as the read path (see
    // PcmAudioGrid.audioReaders)
    val it = writers.iterator
    var written = false
    while (it.hasNext && !written) {
      val w = it.next()
      if (w.isFileTypeSupported(tpe, ais)) { w.write(ais, tpe, out); written = true }
    }
    require(written, s"block_tone_audio_encode: no JDK writer for '$format'")
    out.toByteArray
  }

  private lazy val writers: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
    while (it.hasNext) b += it.next()
    b.result()
  }
}

/** REAL audio decode + feature extraction: reads the payload with
  * `javax.sound.sampled` (WAV or AIFF - whatever reader the JDK
  * resolves), converts to signed 16-bit samples (channel 0 of the
  * first `windows * windowLen` frames), and returns the per-window
  * mean ABSOLUTE amplitude (floor of integer division) as `windows`
  * longs - the energy-envelope fingerprint an audio near-dup pass
  * thresholds, exact-integer so an external oracle can replay it.
  * Fails loudly on undecodable bytes or audio shorter than the grid;
  * screen with [[AudioDecodable]] when the corpus may contain junk. */
case class PcmAudioGrid(child: Expression, windows: Int, windowLen: Int)
    extends UnaryExpression {

  require(windows >= 1 && windows <= 256, s"windows $windows outside [1, 256]")
  require(windowLen >= 1, s"windowLen $windowLen must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    PcmAudioGrid.compute(input.asInstanceOf[Array[Byte]], windows, windowLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PcmAudioGrid.compute($c, $windows, $windowLen)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pcm_audio_grid"
}

object PcmAudioGrid {

  // The JDK's own WAV/AIFF codec providers, resolved ONCE through the
  // public SPI (the same objects AudioSystem would hand back). Every
  // AudioSystem.getAudioInputStream call goes through a SYNCHRONIZED
  // provider registry - a global lock that serializes a 32-thread
  // decode stage (measured: the parallel audio pass ran 3x slower
  // than the serial one before this cache).
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    b.result()
  }

  // provider resolution memoized by the container magic PLUS the RIFF
  // form type (bytes 0-3 and 8-11): rejecting providers signal "not
  // mine" by THROWING UnsupportedAudioFileException, and paying a
  // constructed exception per non-matching provider per row is
  // measurable at corpus scale - after the first row of a format, its
  // reader is hit directly. The form-type word matters because RIFF is
  // a family ("RIFF....WAVE" is audio, "RIFF....AVI " is video): keyed
  // on bytes 0-3 alone, a corpus mixing WAV and AVI payloads through
  // one column would retry the cached WAV reader on every AVI row -
  // exactly the exception-per-row cost the cache exists to avoid.
  private val readerByMagic =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long,
      javax.sound.sampled.spi.AudioFileReader]()

  /** Decode-path statistic: a global total for monitoring plus a
    * per-thread tally, so specs assert exact deltas for THEIR OWN
    * decodes - a global-only counter made the cache specs racy under
    * any concurrent decode activity on another thread. */
  private[graft] final class DecodeCounter {
    private val global = new java.util.concurrent.atomic.AtomicLong()
    private val local = ThreadLocal.withInitial[Array[Long]](() => Array(0L))
    def increment(): Unit = { global.incrementAndGet(); local.get()(0) += 1 }
    def get(): Long = global.get()
    /** Count of increments performed by the CALLING thread. */
    def onThisThread: Long = local.get()(0)
  }

  // cached reader rejected the payload despite the matching magic key
  // (then the full provider rescan runs); test-visible so the
  // WAV/AVI-mix spec can assert the form-type key prevents thrash
  private[graft] val staleCacheHits = new DecodeCounter

  // full provider iterations (cache misses); test-visible so the
  // AU-of-varying-size spec can assert the key ignores non-form bytes
  private[graft] val fullScans = new DecodeCounter

  // rows short-circuited by the negative cache (below); test-visible
  private[graft] val negativeHits = new DecodeCounter

  private def word(bytes: Array[Byte], off: Int): Long =
    if (bytes.length < off + 4) 0L
    else (((bytes(off) & 0xFF) << 24) | ((bytes(off + 1) & 0xFF) << 16) |
      ((bytes(off + 2) & 0xFF) << 8) | (bytes(off + 3) & 0xFF)).toLong & 0xFFFFFFFFL

  private val RIFF = 0x52494646L // "RIFF"
  private val FORM = 0x464F524DL // "FORM" (IFF family: AIFF/AIFC)
  private val WAVE = 0x57415645L // "WAVE"
  private val AIFF = 0x41494646L // "AIFF"
  private val AIFC = 0x41494643L // "AIFC"

  /** Bounded negative cache, SOUND subset only: a RIFF container whose
    * form type is not WAVE (e.g. "AVI "), or an IFF FORM whose type is
    * not AIFF/AIFC, is rejected by every JDK provider on the container
    * words themselves, regardless of payload bytes - so ONE failed
    * full scan makes the magic proof of unmatchability and every later
    * row with it (each AVI asset in a mixed-media column, at corpus
    * scale) skips the constructed-exception provider scan. Magics
    * outside these two families are NEVER negatively cached: there a
    * corrupt payload shares its magic with valid files, and a negative
    * entry would silently null valid rows. Bounded at 1024 entries
    * (clear-on-overflow; entries are per-FORMAT, so overflow means a
    * pathological corpus, not normal growth). */
  private val unmatchableMagics =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]()

  private def provablyUnmatchable(m: Long): Boolean = {
    val w0 = m >>> 32
    val w8 = m & 0xFFFFFFFFL
    (w0 == RIFF && w8 != WAVE) || (w0 == FORM && w8 != AIFF && w8 != AIFC)
  }

  private def magic(bytes: Array[Byte]): java.lang.Long = {
    val w0 = word(bytes, 0)
    // bytes 8-11 disambiguate only the container FAMILIES that put a
    // form type there (RIFF -> WAVE/AVI, FORM -> AIFF/AIFC). For other
    // formats those bytes are per-file payload - AU stores the data
    // size at offset 8 - and keying on them would turn the cache into
    // a per-file miss with unbounded entries.
    val w8 = if (w0 == RIFF || w0 == FORM) word(bytes, 8) else 0L
    java.lang.Long.valueOf((w0 << 32) | w8)
  }

  private def open(bytes: Array[Byte]): AudioInputStream = {
    val m = magic(bytes)
    val hit = readerByMagic.get(m)
    if (hit != null) {
      try return hit.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => staleCacheHits.increment() } // rescan
    }
    if (unmatchableMagics.contains(m)) { negativeHits.increment(); return null }
    fullScans.increment()
    val it = audioReaders.iterator
    while (it.hasNext) {
      val r = it.next()
      try {
        val ais = r.getAudioInputStream(new ByteArrayInputStream(bytes))
        readerByMagic.put(m, r)
        return ais
      } catch { case _: Exception => () }
    }
    if (provablyUnmatchable(m)) {
      if (unmatchableMagics.size >= 1024) unmatchableMagics.clear()
      unmatchableMagics.add(m)
    }
    null
  }

  def compute(bytes: Array[Byte], windows: Int, windowLen: Int): ArrayData = {
    val samples = decodeSamples(bytes, windows * windowLen)
    require(samples != null,
      "pcm_audio_grid: undecodable audio bytes (no JDK reader matched); " +
        "screen with audio_decodable first if the corpus may contain junk")
    require(samples.length >= windows * windowLen,
      s"pcm_audio_grid: audio has ${samples.length} frames, grid needs " +
        s"${windows * windowLen}")
    val out = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      var sum = 0L
      var j = 0
      while (j < windowLen) {
        val s = samples(w * windowLen + j)
        sum += math.abs(s.toLong)
        j += 1
      }
      out(w) = sum / windowLen
      w += 1
    }
    new GenericArrayData(out)
  }

  /** First `maxFrames` channel-0 samples as signed 16-bit ints, or null
    * when no JDK audio reader matches. Sub-16-bit audio upscales
    * through the JDK's own PCM-to-PCM conversion provider
    * (AudioSystem.getAudioInputStream(target, ais)): PCM_SIGNED and
    * PCM_UNSIGNED streams of any width are read, and the two telephony
    * companding encodings the JRE ships codecs for (ULAW, ALAW) decode
    * through the same call. Anything else - MP3, AAC, real compressed
    * codecs - returns null: no JRE decoder. The conversion path is
    * COLD (fixture and real-world corpora are overwhelmingly 16-bit
    * signed, which short-circuits before the synchronized
    * conversion-provider registry is touched), so the SPI-lock concern
    * documented on [[audioReaders]] does not reopen here. */
  private[graft] def decodeSamples(bytes: Array[Byte],
                                   maxFrames: Int): Array[Int] =
    try {
      val ais0 = open(bytes)
      if (ais0 == null) return null
      val fmt0 = ais0.getFormat
      val convertible = Set[AudioFormat.Encoding](
        AudioFormat.Encoding.PCM_SIGNED, AudioFormat.Encoding.PCM_UNSIGNED,
        AudioFormat.Encoding.ULAW, AudioFormat.Encoding.ALAW)
      val ais =
        if (fmt0.getSampleSizeInBits == 16 &&
          fmt0.getEncoding == AudioFormat.Encoding.PCM_SIGNED) ais0
        else if (convertible.contains(fmt0.getEncoding)) {
          // e.g. 8-bit unsigned WAV or a ULAW telephony capture:
          // decode/upscale to 16-bit signed LE with the same
          // rate/channels through the JDK's own codec chain
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            fmt0.getSampleRate, 16, fmt0.getChannels,
            fmt0.getChannels * 2, fmt0.getSampleRate, false)
          try AudioSystem.getAudioInputStream(target, ais0)
          catch { case _: Exception => null }
        } else null
      if (ais == null) return null
      val fmt = ais.getFormat
      locally {
        val big = fmt.isBigEndian
        val frameBytes = fmt.getFrameSize
        val want = math.min(maxFrames.toLong,
          if (ais.getFrameLength >= 0) ais.getFrameLength else maxFrames.toLong).toInt
        val buf = new Array[Byte](want * frameBytes)
        var off = 0
        var r = 0
        while (off < buf.length && r >= 0) {
          r = ais.read(buf, off, buf.length - off)
          if (r > 0) off += r
        }
        val frames = off / frameBytes
        val out = new Array[Int](frames)
        var i = 0
        while (i < frames) {
          val k = i * frameBytes // channel 0 leads each frame
          val b0 = buf(k) & 0xFF
          val b1 = buf(k + 1) & 0xFF
          out(i) = ((if (big) (b0 << 8) | b1 else (b1 << 8) | b0) << 16) >> 16
          i += 1
        }
        out
      }
    } catch { case _: Exception => null }
}

/** True iff the JDK resolves an audio reader for PCM in the payload
  * (16-bit signed directly; other PCM widths/signs via the JDK's own
  * conversion) - the quarantine predicate in front of [[PcmAudioGrid]]. */
case class AudioDecodable(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(input: Any): Any =
    PcmAudioGrid.decodeSamples(input.asInstanceOf[Array[Byte]], 1) != null

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(graft.functions.PcmAudioGrid.decodeSamples($c, 1) != null)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "audio_decodable"
}
