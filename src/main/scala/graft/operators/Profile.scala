package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass column profiling: row/null/distinct counts, range, and
  * quartiles for a set of numeric columns, emitted long-format (one row
  * per column).
  *
  * All statistics for all columns are computed in ONE aggregation over
  * the table - a single scan, partial aggregation map-side - and the
  * wide 1-row result is unpivoted driver-free with explode. The exact
  * and approximate variants share one plan builder, so their shape and
  * output schema cannot drift: only the two aggregate functions differ.
  */
object Profile {

  private def profile(df: DataFrame, numericCols: Seq[String],
                      distinctAgg: Column => Column,
                      pctAgg: (Column, Double) => Column): DataFrame = {
    require(numericCols.nonEmpty, "no columns to profile")
    val aggs = numericCols.flatMap { c =>
      val d = col(c).cast("double")
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(col(c)).as(s"${c}__nn"),
        distinctAgg(col(c)).as(s"${c}__nd"),
        min(d).as(s"${c}__min"),
        max(d).as(s"${c}__max"),
        pctAgg(d, 0.25).as(s"${c}__p25"),
        pctAgg(d, 0.5).as(s"${c}__p50"),
        pctAgg(d, 0.75).as(s"${c}__p75"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(numericCols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"${c}__n").as("n_rows"),
        (col(s"${c}__n") - col(s"${c}__nn")).as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"),
        col(s"${c}__p25").cast("double").as("p25"),
        col(s"${c}__p50").cast("double").as("p50"),
        col(s"${c}__p75").cast("double").as("p75"))
    }: _*)
    one.select(explode(entries).as("p")).select(col("p.*"))
  }

  /** Exact profile: `countDistinct`/`percentile` keep the result
    * engine-reproducible (the DuckDB oracle recomputes them). */
  def summarize(df: DataFrame, numericCols: Seq[String]): DataFrame =
    profile(df, numericCols, c => countDistinct(c),
      (d, p) => percentile(d, lit(p)))

  /** The 100 TB path: identical plan shape and output schema, with
    * sketches in place of the exact aggregates - `approx_count_distinct`
    * (HyperLogLog++, fixed-size state regardless of cardinality) and
    * `approx_percentile` (bounded-error quantile sketch). Exact
    * countDistinct re-shuffles each column's values; the sketches keep
    * the whole profile one partial-aggregable scan with O(cols) state
    * per partition.
    *
    * @param rsd relative error for the distinct-count sketch
    * @param percentileAccuracy 1/eps for the quantile sketch
    */
  def summarizeApprox(df: DataFrame, numericCols: Seq[String],
                      rsd: Double = 0.02,
                      percentileAccuracy: Int = 10000): DataFrame =
    profile(df, numericCols, c => approx_count_distinct(c, rsd),
      (d, p) => percentile_approx(d, lit(p), lit(percentileAccuracy)))
}
