package graft

import graft.llm.LmScore

/** Model-based curation scores: bigram-LM perplexity, DSIR importance
  * weights, per-source KL drift — hand-computed micro-nat ground truth
  * plus the structural guarantees (exact-integer aggregation, KL >= 0,
  * identical-distribution zero). */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("bigramLmScores matches hand-computed micro-nat totals") {
    // uni: a=3 b=1 c=1; V=3 N=5; bi: (a,b)=1 (b,a)=1 (a,c)=1
    // doc1 [a,b,a]: ln .5, ln 1/3, ln .5 -> micro 693147+1098612+693147
    // doc2 [a,c]:   ln .5, ln 1/3        -> micro 693147+1098612
    val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val r = LmScore.bigramLmScores(docs)
      .select("doc_id", "n_tokens", "micro_nll", "avg_nll")
      .as[(Long, Int, Long, Double)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 3, 2484906L, 0.828302)))
    assert(r(1)._1 == 2L && r(1)._2 == 2 && r(1)._3 == 1791759L)
    assert(math.abs(r(1)._4 - 0.89588) < 1e-9)
  }

  test("bigramLmScores: common text scores lower nll than rare text") {
    val docs = (1L to 8L).map(i => (i, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
      .union(Seq((9L, "zxq vvw kkj pqr mno")).toDF("doc_id", "text"))
    val r = LmScore.bigramLmScores(docs)
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    assert(r(1L) < r(9L)) // the repeated sentence is the fluent one
  }

  test("lossReweightReport: hard source upweighted, weights sum to ~1e6") {
    // source 'easy' = one repeated fluent sentence (low NLL under the
    // corpus LM); 'hard' = all-distinct rare words (high NLL)
    val docs = ((1L to 8L).map(i => (i, "easy", "the cat sat on the mat")) ++
      (9L to 12L).map(i => (i, "hard",
        (1 to 6).map(j => s"rare${i}x$j").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val rows = LmScore.lossReweightReport(docs)
      .select("source", "excess_micro", "weight_ppm")
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(rows("hard")._1 > 0 && rows("easy")._1 < 0)
    assert(rows("hard")._2 > rows("easy")._2)
    val total = rows.values.map(_._2).sum
    assert(math.abs(total - 1000000L) <= rows.size) // ppm rounding slack
  }

  test("dsirScores: target-like docs keep, disjoint-vocab docs drop") {
    val corpus = Seq(
      (1L, "alpha beta gamma alpha beta"),
      (2L, "alpha beta gamma beta alpha"),
      (3L, "omega sigma tau omega sigma")
    ).toDF("doc_id", "text")
    val target = corpus.filter($"doc_id" <= 2L)
    val r = LmScore.dsirScores(corpus, target)
      .select("doc_id", "micro_llr", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(r(0)._3 && r(1)._3, "target-domain docs must keep")
    assert(!r(2)._3, "disjoint-vocab doc must drop")
    assert(r(0)._2 > r(2)._2)
  }

  test("sourceKlReport: single source has exactly zero KL") {
    val docs = Seq((1L, "a", "x b c"), (2L, "a", "b c d"))
      .toDF("doc_id", "source", "text")
    val r = LmScore.sourceKlReport(docs)
      .select("source", "n_tokens", "pico_kl", "kl")
      .as[(String, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(("a", 6L, 0L, 0.0)))
  }

  test("sourceKlReport: disjoint sources diverge, KL non-negative") {
    val docs = Seq(
      (1L, "a", "aa bb aa bb aa"), (2L, "a", "aa bb cc aa bb"),
      (3L, "b", "xx yy xx yy xx"), (4L, "b", "xx yy zz xx yy")
    ).toDF("doc_id", "source", "text")
    val r = LmScore.sourceKlReport(docs)
      .select("source", "pico_kl").as[(String, Long)].collect().toMap
    assert(r("a") > 0L && r("b") > 0L)
  }

  private def labeledDocs = Seq(
    (1L, 1, "alpha beta gamma alpha beta gamma"),
    (2L, 1, "beta gamma alpha beta alpha gamma"),
    (3L, 1, "gamma alpha beta gamma beta alpha"),
    (4L, 0, "omega sigma tau omega sigma tau"),
    (5L, 0, "sigma tau omega sigma tau omega"),
    (6L, 0, "tau omega sigma tau sigma omega")
  ).toDF("doc_id", "y", "text")

  test("logreg separates a balanced linearly separable corpus") {
    val r = LmScore.logregQualityScores(labeledDocs, $"y" === 1)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert((1L to 3L).forall(r(_)), "positive-class docs keep")
    assert(!(4L to 6L).exists(r(_)), "negative-class docs drop")
  }

  test("logreg training is deterministic (exact integer weights)") {
    val w1 = LmScore.logregTrainWeights(labeledDocs, $"y" === 1)
    val w2 = LmScore.logregTrainWeights(labeledDocs, $"y" === 1)
    assert(w1 == w2)
    assert(w1.contains("__bias__"))
    // step-1 gradient from sigma(0)=0.5 pushes positive-class buckets up
    assert(w1.values.exists(_ > 0L) && w1.values.exists(_ < 0L))
  }

  test("logregScore under an explicit model is a pure broadcast join") {
    val w = LmScore.logregTrainWeights(labeledDocs, $"y" === 1)
    val scored = LmScore.logregScore(labeledDocs, w)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(scored.count() == 6)
  }
}
