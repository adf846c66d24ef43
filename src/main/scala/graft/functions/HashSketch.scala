package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}

/** Native codegen'd sketch expressions for the dedup family. These are the
  * per-row hot loops of near-duplicate detection at scale: the equivalent
  * higher-order-function formulations (aggregate/zip_with/transform) are
  * interpreted and allocate a k-element array per shingle - measured 7s per
  * query at sf0.1 vs well under 1s for these single-pass loops.
  */

/** MinHash signature of a shingle array: position p is the minimum over
  * shingles of draw_p(shingle). Each shingle is xxhash64'd ONCE (seed 42,
  * identical to Spark's `xxhash64`); the k per-position draws come from a
  * splitmix64 finalizer over (hash + p * golden-gamma) - the standard
  * "one strong hash + k cheap mixes" construction, 64x less string
  * hashing than k independent xxhash64 passes.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = XXH64.hashUTF8String(shingles.getUTF8String(i), 42L)
        var p = 0
        while (p < k) {
          var z = h + p * 0x9E3779B97F4A7C15L // golden gamma
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L // splitmix64 finalizer
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^= (z >>> 31)
          if (z < mins(p)) mins(p) = z
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Fused tokenize -> shingle -> MinHash signature over raw text: one pass,
  * no shingle strings ever materialized (an n-gram's hash combines the n
  * token hashes). The SQL-expression formulation of the same pipeline
  * (regex split + transform/slice/concat_ws + aggregate) spends ~3s at
  * sf0.1 just BUILDING shingle strings; this computes the signature in
  * the time the scan takes.
  *
  * Tokenization: lowercase, maximal runs of [A-Za-z0-9_] (ASCII \w, the
  * same class the previous regex-split used on this corpus). Fewer than
  * `n` tokens degrade to a single whole-text shingle, like the HOF
  * version did.
  */
case class MinHashTextSig(child: Expression, n: Int, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashTextSig.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashTextSig.compute($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_text_sig"
}

object MinHashTextSig {

  private final val GAMMA = 0x9E3779B97F4A7C15L

  @inline private def mix64(x0: Long): Long = {
    var z = x0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def compute(text: org.apache.spark.unsafe.types.UTF8String, n: Int, k: Int): ArrayData = {
    val s = text.toString
    val len = s.length

    // token hashes: FNV-1a-64 over lowercased chars of each \w+ run,
    // strengthened with a splitmix finalizer
    var tokHashes = new Array[Long](math.max(16, len / 4))
    var ntok = 0
    var i = 0
    while (i < len) {
      var c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '_') {
        var h = 0xCBF29CE484222325L
        while (i < len && {
          c = s.charAt(i)
          (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            (c >= '0' && c <= '9') || c == '_'
        }) {
          val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
          h = (h ^ lc) * 0x100000001B3L
          i += 1
        }
        if (ntok == tokHashes.length) {
          tokHashes = java.util.Arrays.copyOf(tokHashes, ntok * 2)
        }
        tokHashes(ntok) = mix64(h)
        ntok += 1
      } else i += 1
    }

    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)

    @inline def drawMins(shingleHash: Long): Unit = {
      var p = 0
      while (p < k) {
        val z = mix64(shingleHash + p * GAMMA)
        if (z < mins(p)) mins(p) = z
        p += 1
      }
    }

    if (ntok < n) {
      // degenerate doc: one whole-text shingle (hash of all token hashes;
      // empty text hashes the FNV offset alone)
      var h = GAMMA
      var t = 0
      while (t < ntok) { h = mix64(h ^ tokHashes(t)); t += 1 }
      drawMins(h)
    } else {
      var pos = 0
      while (pos <= ntok - n) {
        var h = GAMMA
        var j = pos
        while (j < pos + n) { h = mix64(h ^ tokHashes(j)); j += 1 }
        drawMins(h)
        pos += 1
      }
    }
    new GenericArrayData(mins)
  }
}

/** Word n-gram shingles of lowercased text as `array<string>`: the same
  * single-pass ASCII-\w tokenizer as [[MinHashTextSig]], emitting distinct
  * space-joined n-grams (fewer than n tokens degrade to one whole-text
  * shingle). Feeds exact-Jaccard verification; the SQL formulation
  * (regex split + transform/slice/concat_ws + array_distinct) runs
  * interpreted and allocates per position. */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleArray.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleArray.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_array"
}

object ShingleArray {
  def compute(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    // tokenize: lowercased maximal [A-Za-z0-9_] runs
    val toks = new scala.collection.mutable.ArrayBuffer[String](16)
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '_') {
        sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      } else if (sb.length > 0) { toks += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) toks += sb.toString

    val out = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]
    if (toks.length < n) {
      out.add(org.apache.spark.unsafe.types.UTF8String.fromString(
        toks.mkString(" ")))
    } else {
      var pos = 0
      while (pos <= toks.length - n) {
        val g = new java.lang.StringBuilder
        var j = pos
        while (j < pos + n) {
          if (j > pos) g.append(' ')
          g.append(toks(j)); j += 1
        }
        out.add(org.apache.spark.unsafe.types.UTF8String.fromString(g.toString))
        pos += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}

/** Fused tokenize -> SimHash over raw text: same single-pass tokenizer as
  * [[MinHashTextSig]], with the per-token 64-bit hash feeding the +-1 bit
  * counters directly - no token array, no per-token UTF8String. */
case class SimHashText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHashText.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash_text"
}

/** Portable md5-bit SimHash signature as a 64-char '0'/'1' string - the
  * fused native path behind [[graft.llm.Dedup.simhashMd5Pairs]]. Tokens
  * are maximal ASCII `[a-zA-Z0-9_]` runs, lowercased inline, so plain
  * ASCII text works raw. ORACLE PARITY still requires the `lower()`
  * wrapper Dedup applies: characters whose UNICODE lowercase folds INTO
  * ASCII (Kelvin sign -> 'k', dotted capital I -> 'i'+combining mark)
  * tokenize differently raw vs pre-lowercased; pre-lowercased input
  * passes through unchanged. Per token: bit j of the signature draw is bit
  * (63-j) of the big-endian first 8 md5 bytes - identical to "bit
  * (3 - j%4) of hex digit j/4 of the md5 hex string", which is what the
  * oracle computes from `md5(t)` text. Signature bit = 1 iff strictly
  * more than half the tokens drew 1 (ties and tokenless input give 0).
  * The HOF formulation of this (aggregate + zip_with + 64 conv/substr
  * lambdas per token) ran interpreted at ~15s for sf0.1; this is a
  * single pass with one digest per token. */
case class SimHashMd5Text(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    SimHashMd5Text.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashMd5Text.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash_md5_text"
}

object SimHashMd5Text {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val s = text.toString
    val len = s.length
    val counts = new Array[Int](64)
    var n = 0
    var i = 0
    val buf = new java.lang.StringBuilder
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '_') {
        buf.setLength(0)
        while (i < len && {
          val c2 = s.charAt(i)
          (c2 >= 'a' && c2 <= 'z') || (c2 >= 'A' && c2 <= 'Z') ||
            (c2 >= '0' && c2 <= '9') || c2 == '_'
        }) {
          val ch = s.charAt(i)
          buf.append(if (ch >= 'A' && ch <= 'Z') (ch + 32).toChar else ch)
          i += 1
        }
        val digest = md.get()
        digest.reset()
        val bytes = digest.digest(
          buf.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (bytes(b) & 0xFFL); b += 1 }
        var j = 0
        while (j < 64) { counts(j) += ((v >>> (63 - j)) & 1L).toInt; j += 1 }
        n += 1
      } else i += 1
    }
    val out = new Array[Byte](64)
    var j = 0
    while (j < 64) { out(j) = if (2 * counts(j) > n) '1' else '0'; j += 1 }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
  }
}

object SimHashText {

  @inline private def mix64(x0: Long): Long = {
    var z = x0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def compute(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val s = text.toString
    val len = s.length
    val counters = new Array[Int](64)
    var i = 0
    while (i < len) {
      var c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '_') {
        var h = 0xCBF29CE484222325L
        while (i < len && {
          c = s.charAt(i)
          (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            (c >= '0' && c <= '9') || c == '_'
        }) {
          val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
          h = (h ^ lc) * 0x100000001B3L
          i += 1
        }
        h = mix64(h)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      } else i += 1
    }
    var packed = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) packed |= (1L << b)
      b += 1
    }
    packed
  }
}

/** 64-bit SimHash of a token array: per bit, sum +-1 weighted by the
  * token-hash bit; the sign vector packs into one long. Token hashing is
  * `xxhash64` (seed 42) - bit-for-bit the values Spark's builtin produces,
  * so results match the previous higher-order-function formulation exactly.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  def compute(tokens: ArrayData): Long = {
    val counters = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = XXH64.hashUTF8String(tokens.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var packed = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) packed |= (1L << b)
      b += 1
    }
    packed
  }
}

/** Portable md5-permutation MinHash signature over a shingle array:
  * position i (1-based) is the minimum over shingles of the first 16
  * hex chars of md5(i || '|' || shingle) - byte-identical to the HOF
  * construction `transform(sequence(1, k), i -> array_min(transform(
  * sh, s -> substring(md5(i || '|' || s), 1, 16))))` it replaces
  * (equivalence pinned in LlmSpec), which ran interpreted and
  * allocated a k-element string array per shingle. One pass here: the
  * 8-byte digest prefix is compared as an unsigned long (fixed-width
  * lowercase hex orders exactly like the unsigned number it encodes)
  * and each position formats ONE final hex string. The k digests per
  * shingle are inherent to the portable scheme - the DuckDB oracle
  * replays the same md5 calls.
  *
  * An empty shingle array yields k nulls (array_min over an empty
  * array is null), matching the HOF semantics - hence containsNull. */
case class Md5MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override protected def nullSafeEval(input: Any): Any =
    Md5MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5MinHashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_minhash_sig"
}

object Md5MinHashSig {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  def compute(sh: ArrayData, k: Int): ArrayData = {
    val n = sh.numElements()
    val out = new Array[Any](k)
    if (n == 0) return new GenericArrayData(out) // k nulls, HOF parity
    val mins = new Array[Long](k)
    val digest = md.get()
    var i = 0
    while (i < k) {
      val prefix = (i + 1).toString
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      var minV = 0L
      var first = true
      var j = 0
      while (j < n) {
        val sb = sh.getUTF8String(j).getBytes
        digest.reset()
        digest.update(prefix)
        digest.update('|'.toByte)
        val bytes = digest.digest(sb)
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (bytes(b) & 0xFFL); b += 1 }
        if (first || java.lang.Long.compareUnsigned(v, minV) < 0) {
          minV = v; first = false
        }
        j += 1
      }
      mins(i) = minV
      i += 1
    }
    i = 0
    while (i < k) {
      val cs = new Array[Byte](16)
      var b = 0
      while (b < 16) {
        cs(b) = HexChars(((mins(i) >>> ((15 - b) * 4)) & 0xF).toInt).toByte
        b += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromBytes(cs)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Bottom-k md5 sketch over a shingle array: the k smallest values of
  * substring(md5(shingle), 1, 16), ascending - byte-identical to the
  * HOF construction `slice(array_sort(transform(sh, s ->
  * substring(md5(s), 1, 16))), 1, k)` it replaces (fixed-width
  * lowercase hex orders exactly like the unsigned 64-bit number it
  * encodes, so sorting digest prefixes as sign-flipped longs IS the
  * hex sort). One digest per shingle and one final hex formatting per
  * kept hash, vs the HOF path's per-shingle string materialization and
  * full-array string sort. Fewer than k shingles yield all of them;
  * an empty array yields an empty array. */
case class BottomKMd5(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    BottomKMd5.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BottomKMd5.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bottom_k_md5"
}

object BottomKMd5 {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  def compute(sh: ArrayData, k: Int): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    val digest = md.get()
    // sign-flipped prefixes: signed sort order == unsigned hex order
    val vs = new Array[Long](n)
    var j = 0
    while (j < n) {
      digest.reset()
      val bytes = digest.digest(sh.getUTF8String(j).getBytes)
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (bytes(b) & 0xFFL); b += 1 }
      vs(j) = v ^ Long.MinValue
      j += 1
    }
    java.util.Arrays.sort(vs)
    val m = math.min(k, n)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val v = vs(i) ^ Long.MinValue
      val cs = new Array[Byte](16)
      var b = 0
      while (b < 16) {
        cs(b) = HexChars(((v >>> ((15 - b) * 4)) & 0xF).toInt).toByte
        b += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromBytes(cs)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Winnowing fingerprint selection over a token array: hash every word
  * `k`-gram (md5, first 15 hex chars as a 60-bit integer - the
  * portable `conv(substring(md5(gram), 1, 15), 16, 10)` convention),
  * slide a window of `w` consecutive gram hashes, select the LEFTMOST
  * minimum of each window, and emit the distinct selections as
  * (pos, fp) structs with 1-based gram positions - byte-identical to
  * the HOF construction in the q_t_winnow oracle (array_distinct over
  * per-window array_position(slice, array_min(slice))).
  *
  * One digest per gram (the HOF path re-built the gram string, hex
  * digest, and conv per window membership) and an O(grams) monotonic
  * deque for the sliding minimum: pop-from-back on STRICTLY greater
  * values keeps the earliest of equal minima at the front, which IS
  * the leftmost-tie convention. Fewer than w grams degrade to one
  * window over all grams; fewer than k tokens yield an empty array. */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WinnowSelect.compute(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowSelect.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_select"
}

object WinnowSelect {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(ws: ArrayData, k: Int, w: Int): ArrayData = {
    val n = ws.numElements()
    if (n < k) return new GenericArrayData(new Array[Any](0))
    val g = n - k + 1
    val digest = md.get()
    // gram hashes: md5 of the space-joined k words; first 15 hex chars
    // = top 60 bits of the 8-byte big-endian prefix
    val gh = new Array[Long](g)
    var i = 0
    while (i < g) {
      digest.reset()
      var j = 0
      while (j < k) {
        if (j > 0) digest.update(' '.toByte)
        digest.update(ws.getUTF8String(i + j).getBytes)
        j += 1
      }
      val bytes = digest.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (bytes(b) & 0xFFL); b += 1 }
      gh(i) = v >>> 4 // 60-bit value, nonnegative: plain Long compare ok
      i += 1
    }
    val windows = math.max(g - w + 1, 1)
    val positions = new Array[Int](windows) // selected 0-based positions
    var nSel = 0
    // monotonic deque of indices; values strictly increasing front->back
    val deque = new Array[Int](g)
    var head = 0
    var tail = 0 // [head, tail)
    var idx = 0
    val firstWindowEnd = math.min(w, g) // window 1 covers grams [0, w)
    while (idx < firstWindowEnd) {
      while (tail > head && gh(deque(tail - 1)) > gh(idx)) tail -= 1
      deque(tail) = idx; tail += 1
      idx += 1
    }
    positions(0) = deque(head); nSel = 1
    var win = 1
    while (win < windows) {
      // window covers [win, win + w)
      if (deque(head) < win) head += 1
      val in = win + w - 1
      while (tail > head && gh(deque(tail - 1)) > gh(in)) tail -= 1
      deque(tail) = in; tail += 1
      val sel = deque(head)
      if (sel != positions(nSel - 1)) { positions(nSel) = sel; nSel += 1 }
      win += 1
    }
    val out = new Array[Any](nSel)
    i = 0
    while (i < nSel) {
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      row.setInt(0, positions(i) + 1) // 1-based, oracle convention
      row.setLong(1, gh(positions(i)))
      out(i) = row
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Positional word n-grams of the lowercased text as
  * `array<struct<pos:bigint, gram:string>>` - the gram stream of the
  * repeated/maximal-span dedup operators ([[graft.llm.Dedup]]).
  *
  * Tokenization is EXACTLY TextAnalysis.normalizedWords (Unicode
  * lowercase via UTF8String.toLowerCase - the same call Spark's `lower`
  * makes - then Java-regex `\s+` splitting, i.e. runs of
  * space/\t/\n/\x0B/\f/\r delimit; trim is subsumed by the split), and
  * fewer than n words emit an EMPTY array (the caller's `size(ws) >= n`
  * filter becomes explode-of-empty). The SQL formulation - transform
  * over an index sequence with slice + array_join per position - runs
  * interpreted and allocates a slice array per position; this is one
  * pass with a rolling join buffer. Equivalence is pinned in
  * NgramPosSpec and by the span-family DuckDB oracles, which replay the
  * SQL construction.
  */
case class NgramPosArray(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("gram", StringType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    NgramPosArray.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramPosArray.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ngram_pos_array"
}

object NgramPosArray {
  def compute(text: org.apache.spark.unsafe.types.UTF8String,
              n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val len = s.length
    // Java \s token split: words = maximal runs of non-[ \t\n\x0B\f\r]
    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
        c == '\r'
    val starts = new scala.collection.mutable.ArrayBuffer[Int](32)
    val ends = new scala.collection.mutable.ArrayBuffer[Int](32)
    var i = 0
    while (i < len) {
      if (!isWs(s.charAt(i))) {
        val st = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        starts += st; ends += i
      } else i += 1
    }
    val w = starts.length
    if (w < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](w - n + 1)
    var pos = 0
    val sb = new java.lang.StringBuilder
    while (pos <= w - n) {
      sb.setLength(0)
      var j = pos
      while (j < pos + n) {
        if (j > pos) sb.append(' ')
        sb.append(s, starts(j), ends(j))
        j += 1
      }
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      row.setLong(0, pos.toLong)
      row.update(1,
        org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString))
      out(pos) = row
      pos += 1
    }
    new GenericArrayData(out)
  }
}
