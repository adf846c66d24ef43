package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llm.Ann

/** Streaming ANN top-k retrieval: a continuous stream of query vectors
  * searched against a STATIC IVF-celled corpus - the online-serving
  * form of [[graft.llm.Ann.knnJoin]], and the retrieval twin of
  * [[graft.llm.Contamination]]'s stream-static decontamination screen.
  *
  * A training-data pipeline meets this shape constantly: an indexed
  * reference corpus (the deduped training set, a retrieval index, an
  * eval-set embedding bank) stays put while queries arrive - new
  * documents to place, user queries to serve, candidate evals to
  * screen. The batch kNN join re-shuffles BOTH sides per run; here the
  * corpus side plans once per micro-batch as an ordinary static scan
  * (partition-prunable, cacheable) and only the query stream moves.
  *
  * Scale contract:
  *   - [[candidates]] is STATELESS: per arriving query, probe-cell
  *     selection against plan-time centroid literals (no centroid
  *     join), then one stream-static equi-join on the cell id - the
  *     probed corpus slice is O(corpus / cells * nprobe) per query,
  *     never a full scan; scoring is Spark's own codegen'd cosine
  *     column, so the doubles are bit-identical to the batch path's.
  *   - [[topK]] holds EXACTLY k (neighbor, sim) entries per active
  *     query id - merge new candidates, keep the best k - so state is
  *     bounded by active queries, not stream history; `timeoutMs > 0`
  *     evicts idle queries by processing-time timeout.
  *
  * Ordering/parity contract (the [[StreamingNearDup]] convention):
  * each group firing emits its CURRENT top-k, so a query whose
  * candidates span micro-batches re-emits refined rows into an append
  * sink; exact batch parity (one final top-k per query, equal to
  * [[Ann.knnJoin]] and the q_ann_knn_join DuckDB oracle) holds for
  * single-batch delivery, which the registry query enforces at run
  * time. */
object StreamingAnn {

  /** One scored candidate: query `q_id` against corpus `neighbor_id`. */
  case class Cand(q_id: Long, neighbor_id: Long, sim: Double)

  /** `neighbor_id` is `q_id`'s rank-th nearest stored neighbor. */
  case class Hit(q_id: Long, neighbor_id: Long, rank: Long)

  /** Stateless candidate stage: explode each arriving query to its
    * `nprobe` probe cells ([[Ann.probeCellsCol]], centroids as
    * plan-time literals), equi-join the static corpus on its
    * [[Ann.ivfAssign]] cell, score with [[Ann.cosine]]. A corpus
    * vector lives in exactly one cell and a query probes distinct
    * cells, so each (query, neighbor) pair appears at most once per
    * delivery. Works identically on batch and streaming `queries`.
    *
    * Null embeddings on either side are dropped (a null cosine is not
    * a candidate, and would NPE the primitive-double [[Cand]] encoder);
    * this diverges from [[Ann.knnJoin]] only when a query has fewer
    * than k non-null candidates, where knnJoin pads with null-cosine
    * rows ranked last. */
  def candidates(queries: DataFrame, corpus: DataFrame,
                 centroids: Seq[Seq[Double]], nprobe: Int = 2,
                 excludeSelf: Boolean = false,
                 qIdCol: String = "q_id", cIdCol: String = "vec_id",
                 vecCol: String = "embedding"): Dataset[Cand] = {
    import queries.sparkSession.implicits._
    val probed = queries
      .filter(col(vecCol).isNotNull)
      .select(col(qIdCol).cast("long").as("q_id"), col(vecCol).as("__qv"))
      .withColumn("cell",
        explode(Ann.probeCellsCol(col("__qv"), centroids, nprobe)))
    val cells = Ann.ivfAssign(corpus.filter(col(vecCol).isNotNull),
        centroids, vecCol)
      .select(col(cIdCol).cast("long").as("neighbor_id"),
        col(vecCol).as("__cv"), col("ivf_cell").as("cell"))
    val joined = probed.join(cells, Seq("cell"))
    val matched =
      if (excludeSelf) joined.filter(col("q_id") =!= col("neighbor_id"))
      else joined
    matched.select(col("q_id"), col("neighbor_id"),
      Ann.cosine(col("__qv"), col("__cv")).as("sim")).as[Cand]
  }

  /** Keyed-state top-k over [[candidates]]: per query id, merge the
    * batch's candidates into the stored best-k list ordered by
    * (sim DESC, neighbor_id ASC) - the [[Ann.knnJoin]] total order -
    * and emit the group's current top-k as ranked [[Hit]]s. State per
    * query is exactly <= k entries.
    *
    * At-least-once safe: the merge DEDUPES by neighbor_id (keeping the
    * max sim) before ranking, so a re-delivered (query, neighbor)
    * candidate - a replayed batch, a re-probe of the same corpus row -
    * cannot occupy two of the k slots and evict a genuinely distinct
    * neighbor; re-delivering the same candidates re-emits the SAME
    * ranked rows. */
  def topK(cands: Dataset[Cand], k: Int,
           timeoutMs: Long = 0L): Dataset[Hit] = {
    require(k >= 1, s"k=$k must be positive")
    import cands.sparkSession.implicits._
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    cands
      .groupByKey(_.q_id)
      .flatMapGroupsWithState[List[(Long, Double)], Hit](
        OutputMode.Append(), timeoutConf) {
        case (qid, rows, state: GroupState[List[(Long, Double)]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val merged =
              (state.getOption.getOrElse(Nil) ++
                rows.map(c => (c.neighbor_id, c.sim)))
                .groupBy(_._1)
                .map { case (id, xs) => (id, xs.map(_._2).max) }
                .toList
                .sortBy { case (id, s) => (-s, id) }
                .take(k)
            state.update(merged)
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            merged.iterator.zipWithIndex.map { case ((id, _), i) =>
              Hit(qid, id, i + 1L)
            }
          }
      }
  }
}
