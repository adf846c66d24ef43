package graft

import graft.functions.BpeSegment
import graft.llm.ByteBpe
import org.apache.spark.sql.functions._

/** Byte-level BPE pins: the GPT-2 byte alphabet's published values,
  * pre-tokenizer vectors (including the documented lookahead-free
  * divergence), hand-computed byte-level tokenizations, multi-byte
  * UTF-8 byte fallback, and the exact encode -> decode round trip. */
class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  test("byte alphabet matches the published GPT-2 mapping") {
    assert(BpeSegment.byteAlphabet(32) == "Ġ")  // space -> Ġ
    assert(BpeSegment.byteAlphabet(10) == "Ċ")  // LF -> Ċ
    assert(BpeSegment.byteAlphabet(9) == "ĉ")   // TAB -> ĉ
    assert(BpeSegment.byteAlphabet(0) == "Ā")   // NUL -> Ā
    assert(BpeSegment.byteAlphabet(65) == "A")       // printable: itself
    assert(BpeSegment.byteAlphabet(126) == "~")
    assert(BpeSegment.byteAlphabet(127) == "ġ") // DEL: first after space
    assert(BpeSegment.byteAlphabet(173) == "Ń") // soft hyphen: last gap
    assert(BpeSegment.byteAlphabet(255) == "ÿ")
    assert(BpeSegment.byteAlphabet.distinct.length == 256)
    (0 until 256).foreach { b =>
      assert(BpeSegment.byteOfChar.get(BpeSegment.byteAlphabet(b)) == b)
    }
  }

  test("pre-tokenizer vectors: GPT-2-class splits, exact text coverage") {
    val got = Seq("Hello, world! 123", "a  b", "x\ny", "don't", "")
      .toDF("text")
      .select(ByteBpe.preTokens(col("text")).as("ts"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("Hello", ",", " world", "!", " 123"))
    // documented lookahead-free divergence: the space run stays one
    // whitespace token instead of donating its last space to "b"
    assert(got(1) == Seq("a", "  ", "b"))
    assert(got(2) == Seq("x", "\n", "y"))
    // contractions fall to the punctuation class: don | 't
    assert(got(3) == Seq("don", "'", "t"))
    assert(got(4) == Seq.empty)
    // coverage: concatenating pre-tokens reproduces the text exactly
    got.zip(Seq("Hello, world! 123", "a  b", "x\ny", "don't", ""))
      .foreach { case (ts, t) => assert(ts.mkString == t) }
  }

  test("hand-computed byte-level tokenization under a 3-rule table") {
    val G = "Ġ"
    val merges = Seq(("h", "e"), ("t", "he"), (G, "the"))
    val docs = Seq((1L, "the theme")).toDF("doc_id", "text")
    val r = ByteBpe.encode(docs, merges)
      .select("n_tokens", "token_ids").as[(Int, Seq[Int])].collect().head
    // "the": t,h,e -> t,he -> the (id 256+1); " theme": Ġ,t,h,e,m,e ->
    // Ġ,t,he,m,e -> Ġ,the,m,e -> Ġthe(258),m(109),e(101)
    assert(r == ((4, Seq(257, 258, 109, 101))))
  }

  test("multi-byte UTF-8 byte fallback: every byte encodes, no UNK") {
    // é = C3 A9 (2 bytes), 🙂 = F0 9F 99 82 (4 bytes)
    val docs = Seq((1L, "héllo"), (2L, "a🙂b"))
      .toDF("doc_id", "text")
    val r = ByteBpe.encode(docs, Seq(("l", "l")))
      .orderBy("doc_id").select("token_ids").as[Seq[Int]].collect().toSeq
    assert(r(0) == Seq(0x68, 0xc3, 0xa9, 0x100 + 0, 0x6f)) // h é ll o
    assert(r(1) == Seq(0x61, 0xf0, 0x9f, 0x99, 0x82, 0x62))
  }

  test("encode -> decode round trip is exact on mixed text") {
    val texts = Seq(
      "the theme of the day",
      "Hello, world!  double  spaces\nand a newline",
      "café 🙂 naïve 42.5%",
      "")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val G = "Ġ"
    val merges = Seq(("h", "e"), ("t", "he"), (G, "the"), ("l", "l"))
    val enc = ByteBpe.encode(docs, merges)
      .orderBy("doc_id").select("token_ids").as[Seq[Int]].collect().toSeq
    enc.zip(texts).foreach { case (ids, t) =>
      assert(ByteBpe.decodeIds(ids, merges) == t)
    }
  }

  test("byte-level training: hand-computed merges incl. space-byte symbol") {
    // pre-tokens of "low low low lot": low(1), " low"(2), " lot"(1)
    // r1: (l,o) 4; r2: (lo,w) 3 beats (Ġ,lo) 3 on left-symbol order
    // ('l' < 'Ġ'); r3: (Ġ,low) 2
    val docs = Seq((1L, "low low low lot")).toDF("doc_id", "text")
    val merges = ByteBpe.train(docs, rounds = 3)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(merges == Seq((1, "l", "o", 4L), (2, "lo", "w", 3L),
      (3, "Ġ", "low", 2L)))
    // train -> encode -> decode closes the loop on the same corpus
    val table = merges.map { case (_, l, r, _) => (l, r) }
    val rt = ByteBpe.decode(ByteBpe.encode(docs, table), table)
      .select("text_decoded").as[String].head()
    assert(rt == "low low low lot")
    // and the learned merges actually compress: "low" is one token
    val ids = ByteBpe.encode(docs, table)
      .select("n_tokens").as[Int].head()
    assert(ids == 6) // low | Ġlow | Ġlow | Ġlo | t
  }

  test("distributed decode inverts encode exactly (incl. multi-byte)") {
    val texts = Seq(
      "the theme of the day",
      "Hello, world!  double  spaces\nand a newline",
      "café 🙂 naïve 42.5%",
      "")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val G = "Ġ"
    val merges = Seq(("h", "e"), ("t", "he"), (G, "the"), ("l", "l"))
    val rt = ByteBpe.decode(ByteBpe.encode(docs, merges), merges)
      .orderBy("doc_id").select("text_decoded").as[String].collect().toSeq
    assert(rt == texts)
  }

  test("ids are a function of the table alone: unseen corpus, stable ids") {
    val merges = Seq(("a", "b"))
    // two disjoint corpora; shared tokens get identical ids
    val e1 = ByteBpe.encode(Seq((1L, "ab")).toDF("doc_id", "text"), merges)
      .select("token_ids").as[Seq[Int]].collect().head
    val e2 = ByteBpe.encode(Seq((1L, "zab")).toDF("doc_id", "text"), merges)
      .select("token_ids").as[Seq[Int]].collect().head
    assert(e1 == Seq(256) && e2 == Seq('z'.toInt, 256))
  }
}
