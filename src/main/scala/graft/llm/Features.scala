package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling event-time feature generation - the per-entity trailing
  * aggregates (counts, min/max over the last N seconds, gap since the
  * previous event) that a training-data pipeline attaches to events
  * before model training.
  *
  * Every feature is computed with window functions over ONE hash
  * partitioning of the entity key: the RANGE frames share the
  * (entity, ts) sort and the ROWS features re-sort the same partitions
  * by the total (ts, id) order - one shuffle total, no self-joins (the
  * naive trailing-window formulation is an event x event range
  * self-join; a window frame is linear in events per entity instead).
  * Counts are exact integers and min/max are order-independent, so
  * every engine reproduces them bit-for-bit; trailing SUMS of doubles
  * are deliberately omitted from the oracle-checked surface
  * (accumulation order differs across engines).
  */
object Features {

  /** Trailing-window features per entity at each event: for every
    * horizon `h` in `horizonsSec`, the count and value min/max over
    * (ts - h, ts] (RANGE frame - ties in `tsSecCol` are peers and all
    * included, so the result is independent of tie order), plus
    * `gap_s` (seconds since the entity's previous event, null at the
    * first) and `seq_n` (1-based event sequence number) under the
    * total (ts, id) order. */
  def rollingFeatures(df: DataFrame, entityCol: String = "user_id",
                      tsSecCol: String = "t", idCol: String = "event_id",
                      valueCol: String = "value",
                      horizonsSec: Seq[Long] = Seq(600L, 3600L)): DataFrame = {
    require(horizonsSec.nonEmpty, "need at least one horizon")
    val wRows = Window.partitionBy(col(entityCol))
      .orderBy(col(tsSecCol), col(idCol))
    val withRange = horizonsSec.foldLeft(df) { (acc, h) =>
      val w = Window.partitionBy(col(entityCol)).orderBy(col(tsSecCol))
        .rangeBetween(-(h - 1), Window.currentRow)
      acc.withColumn(s"n_${h}s", count(lit(1)).over(w))
        .withColumn(s"min_v_${h}s", min(col(valueCol)).over(w))
        .withColumn(s"max_v_${h}s", max(col(valueCol)).over(w))
    }
    withRange
      .withColumn("gap_s", col(tsSecCol) - lag(col(tsSecCol), 1).over(wRows))
      .withColumn("seq_n", row_number().over(wRows))
  }

  /** Per-entity percentile outlier flags: each row gets its entity's
    * q-quantile of `valueCol` (`p_q`) and `is_outlier` = value strictly
    * above it - the per-user anomaly gate of a feature pipeline.
    *
    * `exact = true` uses the exact sort-based `percentile` aggregate
    * (engine-reproducible, what the DuckDB oracle checks);
    * `exact = false` swaps in `approx_percentile` (bounded-error
    * sketch, constant state per group) - the 100 TB path, same schema,
    * mirroring [[graft.operators.Profile]]'s exact/approx pairing.
    * Plan: one hash aggregate to |entities| rows, one equi-join back
    * (AQE broadcasts the stats side when small). */
  def withOutlierFlags(df: DataFrame, entityCol: String = "user_id",
                       valueCol: String = "value", q: Double = 0.95,
                       exact: Boolean = true,
                       approxAccuracy: Int = 10000): DataFrame = {
    require(q > 0 && q < 1, s"quantile $q outside (0, 1)")
    val d = col(valueCol).cast("double")
    val agg = if (exact) percentile(d, lit(q))
      else percentile_approx(d, lit(q), lit(approxAccuracy))
    // The interpolated quantile is quantized to 6 decimals BEFORE the
    // comparison: engines disagree in the last ulp of linear
    // interpolation, and `value > p_q` would flip the int flag on that
    // knife-edge - an int column gets no float-tolerant hashing. The
    // rounded value is also what surfaces as p_q, keeping flag and
    // threshold consistent for the caller. Residual risk: rounding
    // itself has boundaries (Spark rounds the shortest decimal repr,
    // DuckDB rounds in binary), but quantization shrinks the exposed
    // boundary measure from ~every ulp to ~1e-10 per value.
    val stats = df.groupBy(col(entityCol)).agg(round(agg, 6).as("p_q"))
    // left join: a feature-attachment function must never lose rows -
    // an inner join would silently drop null-entity rows (the null-key
    // stats row exists but an equi-join never matches null)
    df.join(stats, Seq(entityCol), "left")
      .withColumn("is_outlier", (col(valueCol) > col("p_q")).cast("int"))
  }
}
