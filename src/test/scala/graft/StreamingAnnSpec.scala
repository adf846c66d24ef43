package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.llm.Ann
import graft.streaming.StreamingAnn
import graft.streaming.StreamingAnn.{Cand, Hit}

/** Streaming ANN top-k retrieval: batch agreement with Ann.knnJoin,
  * cross-batch state merge, tie-breaking, and the k bound. */
class StreamingAnnSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val rnd = new scala.util.Random(23)
    (0L until 40L).map(i =>
      (i, Seq.fill(8)((rnd.nextGaussian() * 0.5 + (i % 4) * 0.7).toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("batch path: candidates + topK returns exactly Ann.knnJoin") {
    val emb = fixture
    val centroids = Ann.hyperplanes(8, 4, seed = 11L)
    val queries = emb.filter($"vec_id" < 3).withColumnRenamed("vec_id", "q_id")
    val got = StreamingAnn.topK(
        StreamingAnn.candidates(queries, emb, centroids, nprobe = 2,
          excludeSelf = true), k = 3)
      .as[(Long, Long, Long)].collect().toSet
    val expect = Ann.knnJoin(queries, emb, k = 3, centroids, nprobe = 2,
        excludeSelf = true)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect && got.size == 9)
  }

  test("cross-batch merge keeps the global best k, not the last batch's") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Cand]
    input.addData(Cand(1L, 10L, 0.9), Cand(1L, 20L, 0.5))
    val q = StreamingAnn.topK(input.toDS(), k = 2)
      .writeStream.format("memory").queryName("ann_hits")
      .outputMode("append").start()
    q.processAllAvailable()
    val after1 = spark.table("ann_hits").as[Hit].collect().toSet
    assert(after1 == Set(Hit(1L, 10L, 1L), Hit(1L, 20L, 2L)))
    // batch 2: 0.7 displaces 0.5 but not 0.9 - the state merge is
    // against everything seen, not batch-local
    input.addData(Cand(1L, 30L, 0.7))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("ann_hits").as[Hit].collect().toSet
    assert(all == after1 ++ Set(Hit(1L, 10L, 1L), Hit(1L, 30L, 2L)))
  }

  test("at-least-once redelivery: a replayed candidate cannot occupy " +
    "two slots or evict a distinct neighbor") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Cand]
    input.addData(Cand(1L, 10L, 0.9), Cand(1L, 20L, 0.5))
    val q = StreamingAnn.topK(input.toDS(), k = 2)
      .writeStream.format("memory").queryName("ann_redeliver")
      .outputMode("append").start()
    q.processAllAvailable()
    // batch 2 redelivers batch 1 verbatim (at-least-once): the state
    // merge must dedupe by neighbor_id, so the re-emission is the SAME
    // ranked rows - without the dedupe, neighbor 10 would fill both
    // slots and rank-2 would flip from 20 to 10
    input.addData(Cand(1L, 10L, 0.9), Cand(1L, 20L, 0.5))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ann_redeliver").as[Hit].collect().toSeq
    assert(rows.size == 4)
    assert(rows.toSet == Set(Hit(1L, 10L, 1L), Hit(1L, 20L, 2L)))
  }

  test("null embeddings are dropped from both sides, not NPE'd") {
    val emb = fixture
    val withNulls = emb.unionByName(
      Seq((100L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val centroids = Ann.hyperplanes(8, 4, seed = 11L)
    val queries = withNulls.filter($"vec_id" === 0L || $"vec_id" === 100L)
      .withColumnRenamed("vec_id", "q_id")
    val hits = StreamingAnn.topK(
        StreamingAnn.candidates(queries, withNulls, centroids, nprobe = 2,
          excludeSelf = true), k = 3)
      .as[(Long, Long, Long)].collect()
    // the null query contributes nothing; the null corpus row is never
    // a neighbor; the real query still gets its k hits
    assert(hits.map(_._1).toSet == Set(0L) && hits.length == 3)
    assert(!hits.exists(_._2 == 100L))
  }

  test("ties order by neighbor_id; emissions never exceed k") {
    val cands = Seq(
      Cand(7L, 5L, 0.8), Cand(7L, 3L, 0.8), Cand(7L, 9L, 0.8),
      Cand(7L, 1L, 0.2)).toDS()
    val hits = StreamingAnn.topK(cands, k = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(hits == Set((7L, 3L, 1L), (7L, 5L, 2L), (7L, 9L, 3L)))
  }
}
