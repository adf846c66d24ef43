package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llm.Dedup

/** Streaming MinHash-LSH near-duplicate detection: flag each arriving
  * document that is LSH-similar to a document seen before it.
  *
  * The batch near-dup family ([[graft.llm.Dedup.minhashMd5Pairs]])
  * answers "which PAIRS in this corpus are near-dups"; a continuously
  * ingesting pipeline asks the online form: "is THIS document a
  * near-dup of anything already accepted". The topology is the same
  * banded signature scheme - md5-permutation minhash signatures
  * (portable: the DuckDB oracle replays the identical digests), bands
  * of k/bands rows, equi-grouping on (band, bandval) - but the
  * band-bucket join becomes KEYED STATE: each LSH bucket holds the
  * signatures of the first `maxBucketDocs` documents it has seen, and
  * an arriving document is flagged when >= `estMinAgree` of its k
  * signature positions agree with some stored document (the
  * signature-agreement verify of [[Dedup.ngramJaccardPairsMd5]] -
  * integer-exact, no shingle-set join, so the verify costs nothing
  * beyond the signatures the bucket already stores).
  *
  * Scale contract:
  *   - the signature stage is stateless and map-only (one native
  *     [[graft.functions.Md5MinHashSig]] pass per doc);
  *   - the only shuffle is groupByKey(band, bandval) - `bands` rows
  *     per doc, exactly the batch LSH exchange;
  *   - state per bucket is <= maxBucketDocs signatures (k 16-char
  *     strings each); buckets beyond the cap stop ACCUMULATING but
  *     keep COMPARING, so a degenerate bucket (boilerplate, empty
  *     docs) costs O(maxBucketDocs) per arrival, never O(bucket);
  *   - with `timeoutMs > 0` (streaming), idle buckets are evicted via
  *     processing-time timeout, bounding total state by ACTIVE
  *     buckets, not stream history.
  *
  * The same code path runs in batch (flatMapGroupsWithState over a
  * batch Dataset processes each bucket once with empty initial state),
  * which is what the oracled registry query q_stream_neardup runs:
  * within a bucket, documents are folded in doc_id order, so "seen
  * before" means doc_id-earlier, and DuckDB replays the semantics
  * with a rank-capped self-join. In a live stream "seen before" is
  * arrival order - feed order IS the semantics, as with
  * [[EventStream.dedupeEvents]].
  */
object StreamingNearDup {

  /** One document's membership in one LSH band bucket. */
  case class BandDoc(band: Int, bandval: String, doc_id: Long,
                     sig: Seq[String])

  /** `doc_id` matched earlier doc `dup_of` in `band` with `n_agree`
    * of k signature positions equal. */
  case class DupFlag(doc_id: Long, band: Int, dup_of: Long, n_agree: Int)

  /** Stateless stage: md5-minhash signatures banded for LSH, `bands`
    * rows per document. Works identically on batch and streaming
    * inputs. Shares [[Dedup.shingles]] + [[graft.functions.Md5MinHashSig]]
    * (and the concat_ws band encoding) with the batch pairs path, so
    * the q_d_minhash_md5 oracle's CTE chain replays it verbatim. */
  def bandedSigs(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", k: Int = 16, bands: Int = 8,
                 shingleN: Int = 3): Dataset[BandDoc] = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val rows = k / bands
    import docs.sparkSession.implicits._
    val sig = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.Md5MinHashSig(
        org.apache.spark.sql.GraftSqlBridge.expression(
          Dedup.shingles(col(textCol), shingleN)), k))
    docs.select(col(idCol).cast("long").as("doc_id"), sig.as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws("#", slice(col("sig"), b * rows + 1, lit(rows))))))
      .select(col("pos").as("band"), col("col").as("bandval"),
        col("doc_id"), col("sig"))
      .as[BandDoc]
  }

  /** Keyed-state near-dup flagging over [[bandedSigs]] output. Emits a
    * [[DupFlag]] per (doc, band) whose bucket already holds a
    * signature agreeing on >= `estMinAgree` of k positions; `dup_of`
    * is the EARLIEST qualifying stored doc. Null signature positions
    * (empty shingle sets) never count as agreement. State per bucket
    * caps at `maxBucketDocs` stored signatures - later docs are still
    * compared, no longer stored. `timeoutMs > 0` adds processing-time
    * eviction of idle buckets (streaming only; the batch twin and
    * tests use 0 = NoTimeout).
    *
    * Ordering contract: "seen before" is ARRIVAL order. Docs are
    * sorted by doc_id only WITHIN a micro-batch group, so batch/oracle
    * equivalence (dup_of < doc_id, stored set = first maxBucketDocs by
    * id) holds iff delivery is doc_id-ordered across micro-batches -
    * trivially true for a single batch. A multi-batch
    * out-of-id-order stream is still correct ONLINE semantics (flag
    * against what was actually seen), but diverges from the
    * rank-capped batch oracle; the registry query ENFORCES
    * single-batch delivery at run time rather than assume it. */
  def flagNearDups(banded: Dataset[BandDoc], estMinAgree: Int = 6,
                   maxBucketDocs: Int = 1000,
                   timeoutMs: Long = 0L): Dataset[DupFlag] = {
    import banded.sparkSession.implicits._
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    banded
      .groupByKey(r => (r.band, r.bandval))
      .flatMapGroupsWithState[List[(Long, Seq[String])], DupFlag](
        OutputMode.Append(), timeoutConf) {
        case (_, rows, state: GroupState[List[(Long, Seq[String])]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // stored in insertion order = ascending doc_id when input
            // arrives in doc order (always true for the batch twin)
            var seen = state.getOption.getOrElse(Nil)
            var nSeen = seen.size
            val out = List.newBuilder[DupFlag]
            rows.toSeq.sortBy(_.doc_id).foreach { r =>
              val sig = r.sig
              var dupOf = Long.MaxValue
              var dupAgree = 0
              seen.foreach { case (id, s) =>
                if (id < dupOf) {
                  var agree = 0
                  var i = 0
                  while (i < sig.length) {
                    val x = sig(i)
                    if (x != null && x == s(i)) agree += 1
                    i += 1
                  }
                  if (agree >= estMinAgree) { dupOf = id; dupAgree = agree }
                }
              }
              if (dupOf != Long.MaxValue)
                out += DupFlag(r.doc_id, r.band, dupOf, dupAgree)
              if (nSeen < maxBucketDocs) {
                seen = seen :+ ((r.doc_id, sig))
                nSeen += 1
              }
            }
            state.update(seen)
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            out.result().iterator
          }
      }
  }

  /** Per-document roll-up of [[flagNearDups]] - the registry shape:
    * each flagged doc once, with its earliest dup partner across all
    * bands and the number of bands that fired. */
  def flagSummary(flags: Dataset[DupFlag]): DataFrame =
    flags.groupBy(col("doc_id"))
      .agg(min(col("dup_of")).as("dup_of"),
        countDistinct(col("band")).as("n_dup_bands"))
}
