package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins - the two temporal join shapes Spark has no
  * native operator for (reference engines expose them as ASOF JOIN /
  * range-predicate joins; DuckDB's ASOF JOIN is the semantic model).
  *
  * Scale design (the 100 TB contract):
  *
  *  - [[asofJoin]] is NOT a join at all: both sides union into one
  *    stream, shuffle ONCE on the key, sort within partitions by
  *    (ts, side, tiebreak), and a running `last(payload, ignoreNulls)`
  *    window picks each left row's most recent right match. A naive
  *    per-row "max right ts <= left ts" subquery join is quadratic per
  *    key; this is O(n log n) per partition with a single exchange -
  *    the same plan a dedicated ASOF JOIN physical operator compiles
  *    to. Hot keys serialize into one partition's sort (inherent to
  *    running-state semantics); shard upstream by time range if a
  *    single key exceeds a partition.
  *
  *  - [[rangeJoinBucketed]] joins L.ts in [R.ts+lo, R.ts+hi] by
  *    quantizing time into buckets of width >= (hi-lo): each right row
  *    explodes into the few buckets its window covers, the join is a
  *    plain equi-join on (key, bucket), and the exact range predicate
  *    filters the residue. Candidate count is bounded by true matches
  *    plus one bucket's worth of slop per row - no BroadcastNestedLoop,
  *    which is what Spark plans for a bare range-only condition.
  */
object TemporalJoins {

  /** For each left row, attach the payload columns of the latest right
    * row with the same key and right.ts <= left.ts (or strictly < when
    * `inclusive = false`). Right payload columns come back null when no
    * prior right row exists (left outer as-of semantics).
    *
    * @param payloadCols right columns to carry onto matches
    * @param tiebreak    right column ordering ties at equal ts (latest
    *                    by this column wins among equal-ts right rows)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payloadCols: Seq[String],
               tiebreak: String, inclusive: Boolean = true): DataFrame = {
    // The tiebreak is compared as a long ("latest wins"); a non-castable
    // type would silently become null and break the ordering contract.
    // DATE cannot cast to long (ANSI rejects it, legacy nulls it), so it
    // goes through unix_date (days since epoch - order-preserving).
    val tieType = right.schema(tiebreak).dataType
    require(tieType.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
      tieType == org.apache.spark.sql.types.DateType ||
      tieType == org.apache.spark.sql.types.TimestampType,
      s"asofJoin tiebreak '$tiebreak' must be numeric/date/timestamp, got $tieType")
    def tieAsLong(c: Column): Column = tieType match {
      case org.apache.spark.sql.types.DateType => unix_date(c).cast("long")
      case org.apache.spark.sql.types.TimestampType => unix_seconds(c)
      case _ => c.cast("long")
    }
    // The event-time columns get the same treatment as the tiebreak: a
    // raw cast("long") on a DATE nulls under legacy mode (the row then
    // vanishes via the null-ts filter) or throws under ANSI. Both sides
    // must convert on the SAME scale (days vs seconds), so mixing a DATE
    // ts with a TIMESTAMP ts is rejected rather than silently compared
    // across units.
    def tsFamily(dt: org.apache.spark.sql.types.DataType): String = dt match {
      case org.apache.spark.sql.types.DateType => "date"
      case org.apache.spark.sql.types.TimestampType => "timestamp"
      case _: org.apache.spark.sql.types.NumericType => "numeric"
      case other => throw new IllegalArgumentException(
        s"asofJoin ts columns must be numeric/date/timestamp, got $other")
    }
    val (lTsType, rTsType) =
      (left.schema(leftTs).dataType, right.schema(rightTs).dataType)
    require(tsFamily(lTsType) == tsFamily(rTsType),
      s"asofJoin ts columns must share a time scale: '$leftTs' is $lTsType " +
        s"but '$rightTs' is $rTsType")
    def tsAsLong(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.DateType => unix_date(c).cast("long")
        case org.apache.spark.sql.types.TimestampType => unix_seconds(c)
        case _ => c.cast("long")
      }
    val leftStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val payloadStruct = struct(
      (payloadCols ++ Seq(tiebreak).filterNot(payloadCols.contains)).map(col): _*)

    val l = left.select(
      keys.map(col) ++ Seq(
        tsAsLong(col(leftTs), lTsType).as("__ts"),
        // at equal ts: inclusive puts right rows (tag 0) before left
        // rows in the sort so the running last() sees them; strict
        // orders left first so equal-ts right rows are invisible
        lit(if (inclusive) 1 else 0).as("__tag"),
        lit(null).cast("long").as("__tie"),
        leftStruct.as("__l"),
        lit(null).cast(right.select(payloadStruct).schema.head.dataType)
          .as("__r")): _*)
    // null keys never match in join semantics (DuckDB ASOF JOIN, and
    // the correlated-lookup oracle); window PARTITION BY would group
    // all null keys together, so null-key right rows must not enter
    // the stream. Same for null-TIMESTAMP right rows: __ts asc sorts
    // nulls first, so one would become the running match for left rows
    // that precede any real right row, while the ASOF model
    // (r.ts <= l.ts) never matches a null ts. Null-key/null-ts LEFT
    // rows still pass through and surface with null payload.
    val r = right
      .filter((keys.map(col(_).isNotNull) :+ col(rightTs).isNotNull)
        .reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(
          tsAsLong(col(rightTs), rTsType).as("__ts"),
          lit(if (inclusive) 0 else 1).as("__tag"),
          tieAsLong(col(tiebreak)).as("__tie"),
          lit(null).cast(left.select(leftStruct).schema.head.dataType).as("__l"),
          payloadStruct.as("__r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__l").isNotNull)
      .select(col("__l.*") +: payloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** Pairs (L, R) sharing `keys` with L.ts in [R.ts + lo, R.ts + hi]
    * (timestamps as epoch seconds / any monotone long). Implemented as a
    * bucketed equi-join: bucket width defaults to the window span, each
    * right row explodes into ceil(span/width)+1 covering buckets, and
    * the exact predicate runs on the equi-join residue. */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
                        leftTs: String, rightTs: String,
                        lo: Long, hi: Long,
                        bucketWidth: Long = 0L): DataFrame = {
    require(hi >= lo, s"empty range [$lo, $hi]")
    val width = if (bucketWidth > 0) bucketWidth else math.max(hi - lo, 1L)

    val lb = left.withColumn("__bucket", floor(col(leftTs).cast("long") / width))
    val rb = right.withColumn("__bucket",
      explode(sequence(floor((col(rightTs).cast("long") + lo) / width),
        floor((col(rightTs).cast("long") + hi) / width))))

    // side-qualified refs: leftTs and rightTs may share a name
    val lt = lb.col(leftTs).cast("long")
    val rt = rb.col(rightTs).cast("long")
    lb.join(rb, keys :+ "__bucket")
      .filter(lt.between(rt + lo, rt + hi))
      .drop("__bucket")
  }
}
