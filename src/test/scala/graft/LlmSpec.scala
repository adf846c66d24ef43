package graft

import org.apache.spark.sql.functions._
import graft.llm.{Ann, Dedup, Multimodal, TextAnalysis}

/** LLM-pipeline operators: dedup, ANN, text analysis, multimodal
  * plumbing - including the scale-safety plan checks (no crossJoin, no
  * collect in any candidate-pair plan). */
class LlmSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "the quick brown fox jumps over the lazy cat again and again"),
    (4L, "completely different content about spark query engines at scale"),
    (5L, "THE QUICK  brown fox jumps over the lazy dog again and again")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val r = Dedup.exact(docs).filter($"dup_count" > 1)
      .select("keep_id", "dup_count").as[(Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 2L)))
  }

  test("normalized dedup also catches case/whitespace variants") {
    val r = Dedup.normalized(docs).filter($"dup_count" > 1)
      .select("keep_id", "dup_count").as[(Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 3L))) // 1, 2 and 5 normalize identically
  }

  test("minhash LSH finds near-dup pairs, not unrelated ones") {
    val pairs = Dedup.minhashLshPairs(docs, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical
    assert(pairs.contains((1L, 5L))) // normalized-identical
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L) ||
      pairs.contains((2L, 3L))) // one-word-off
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated
  }

  test("simhash: identical docs at hamming 0; unrelated docs far apart") {
    val h = docs.select($"doc_id", Dedup.simhash($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L))
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) <
      java.lang.Long.bitCount(h(1L) ^ h(4L)))
  }

  test("SCALE: no CartesianProduct / BroadcastNestedLoop in pair plans") {
    for (df <- Seq(
      Dedup.minhashLshPairs(docs),
      Dedup.simhashPairs(docs),
      Ann.cosineNearDupPairs(
        Seq((1L, Seq.fill(8)(0.5f))).toDF("vec_id", "embedding"), dim = 8))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan.take(500))
      assert(!plan.contains("BroadcastNestedLoop"), plan.take(500))
    }
  }

  test("ANN: brute-force top-k is exact; LSH bucket recall is sane") {
    // three tight clusters around axis directions
    val rnd = new scala.util.Random(1)
    val base = Seq(Seq.fill(16)(0.0), Seq.fill(16)(0.0), Seq.fill(16)(0.0))
      .zipWithIndex.map { case (v, i) => v.updated(i, 1.0) }
    val vecs = (0 until 90).map { i =>
      val c = base(i % 3)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }.toDF("vec_id", "embedding")

    val query = base.head // cluster-0 direction
    val exact = Ann.cosineTopK(vecs, query, 10).select("vec_id")
      .as[Long].collect().toSet
    assert(exact.forall(_ % 3 == 0)) // all from cluster 0

    val approx = Ann.annTopK(vecs, query, 10, dim = 16, bits = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(approx.nonEmpty && approx.forall(_ % 3 == 0))
    assert((exact intersect approx).size >= 5) // decent recall w/ probing

    // IVF with the cluster directions as centroids: probing every cell
    // must reproduce the exact top-k; probing 1 cell keeps cluster-0 hits
    val ivfAll = Ann.ivfTopK(vecs, query, 10, base, nprobe = base.size)
      .select("vec_id").as[Long].collect().toSet
    assert(ivfAll == exact)
    val ivf1 = Ann.ivfTopK(vecs, query, 10, base, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(ivf1.nonEmpty && ivf1.forall(_ % 3 == 0))
  }

  test("text analysis: counts, quality, langid, fingerprint") {
    val t = Seq((1L, "The quick brown fox, and the lazy dog!"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "12345 67890")).toDF("doc_id", "text")

    val q = TextAnalysis.withQualityFeatures(t)
      .select("doc_id", "n_words", "punct_ratio", "digit_ratio")
      .as[(Long, Int, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(q(1L)._2 == 8)
    assert(q(1L)._3 > 0 && q(1L)._4 == 0.0)
    assert(q(3L)._4 > 0.8)

    val lang = TextAnalysis.withLangId(t).select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(lang(1L) == "en" && lang(2L) == "de" && lang(3L) == "und")

    val fp = TextAnalysis.withFingerprint(
      Seq((1L, "a  b"), (2L, "A b"), (3L, "c")).toDF("doc_id", "text"))
      .select("doc_id", "content_md5").as[(Long, String)].collect().toMap
    assert(fp(1L) == fp(2L)) // normalization collapses case+spaces
    assert(fp(1L) != fp(3L))

    val toks = TextAnalysis.wordCount(lit("a b  c")).toString
    val r = Seq(("a b  c d!", 1)).toDF("text", "x")
      .select(TextAnalysis.wordCount($"text"),
        TextAnalysis.tokenCountBpeIsh($"text")).as[(Int, Int)].head()
    assert(r == ((4, 5))) // 4 ws tokens; 4 alnum runs + '!' = 5
  }

  test("multimodal: metadata prunes, frames sample, stub features are stable") {
    val assets = Multimodal.syntheticAssets(docs, "doc_id", "text")
    assert(assets.schema.fieldNames.toSeq ==
      Seq("asset_id", "media_type", "bytes", "meta"))

    val meta = Multimodal.metadataOnly(assets)
    assert(!meta.schema.fieldNames.contains("bytes"))

    val resized = Multimodal.resizeTo(assets, 64)
    val dims = resized.select(greatest($"meta.width", $"meta.height"))
      .as[Int].collect()
    assert(dims.forall(_ <= 64))

    val frames = Multimodal.sampleFrames(assets, everyMs = 60000)
    val counts = frames.groupBy("asset_id").count().as[(Long, Long)].collect()
    assert(counts.nonEmpty) // at least one video asset in 5 docs
    // feature vector: fixed width, deterministic across evaluations
    val f1 = assets.select(Multimodal.fakeDecodeFeatures($"bytes", 8))
      .as[Seq[Float]].collect()
    val f2 = assets.select(Multimodal.fakeDecodeFeatures($"bytes", 8))
      .as[Seq[Float]].collect()
    assert(f1.toSeq == f2.toSeq && f1.forall(_.size == 8))
  }
}
