package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingNearDup
import graft.streaming.StreamingNearDup.DupFlag

/** Streaming MinHash-LSH near-dup flagging: known vectors through the
  * batch path, stream-equals-batch on a multi-batch feed, and the
  * bucket state cap. */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val loremA =
    "the quick brown fox jumps over the lazy dog near the river bank"
  private val loremB =
    "completely different content about spark catalyst optimizer rules"

  test("identical docs flag in every band; distinct docs do not flag") {
    val docs = Seq(
      (1L, loremA), (2L, loremA), (3L, loremB)
    ).toDF("doc_id", "text")
    val flags = StreamingNearDup
      .flagNearDups(StreamingNearDup.bandedSigs(docs))
      .collect().toSet
    // doc 2 matches doc 1 with full 16-position agreement in all 8
    // bands; docs 1 and 3 are never flagged
    assert(flags == (0 until 8).map(b => DupFlag(2L, b, 1L, 16)).toSet)
  }

  test("earliest qualifying stored doc wins as dup_of") {
    val docs = Seq(
      (5L, loremA), (9L, loremA), (12L, loremA)
    ).toDF("doc_id", "text")
    val summary = StreamingNearDup.flagSummary(
        StreamingNearDup.flagNearDups(StreamingNearDup.bandedSigs(docs)))
      .as[(Long, Long, Long)].collect().toSet
    // both later docs point at doc 5, each across all 8 bands
    assert(summary == Set((9L, 5L, 8L), (12L, 5L, 8L)))
  }

  test("bucket state cap stops storing but keeps comparing") {
    val docs = Seq(
      (1L, loremA), (2L, loremA), (3L, loremA)
    ).toDF("doc_id", "text")
    val flags = StreamingNearDup
      .flagNearDups(StreamingNearDup.bandedSigs(docs), maxBucketDocs = 1)
      .collect()
    // doc 1 stored; docs 2 and 3 both compare against ONLY doc 1
    assert(flags.forall(_.dup_of == 1L))
    assert(flags.map(_.doc_id).toSet == Set(2L, 3L))
  }

  test("streaming flags across micro-batches equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = (1 to 20).map { i =>
      // four near-identical groups of five: doc text repeats per i%4
      (i.toLong, s"shared prefix words for group ${i % 4} " +
        "with enough tokens to shingle properly across the text")
    }
    val input = MemoryStream[(Long, String)]
    input.addData(corpus.take(10)) // batch 1: doc ids 1-10
    val query = StreamingNearDup
      .flagNearDups(StreamingNearDup.bandedSigs(
        input.toDF().toDF("doc_id", "text")))
      .writeStream.format("memory").queryName("nd_flags")
      .outputMode("append").start()
    query.processAllAvailable()
    input.addData(corpus.drop(10)) // batch 2: doc ids 11-20
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("nd_flags").as[DupFlag].collect().toSet
    val batch = StreamingNearDup
      .flagNearDups(StreamingNearDup.bandedSigs(
        corpus.toDF("doc_id", "text")))
      .collect().toSet
    // doc_id-ordered arrival across two micro-batches folds each LSH
    // bucket exactly as the single batch pass does
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
