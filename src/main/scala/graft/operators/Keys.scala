package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed surrogate-key assignment.
  *
  * The reference draws keys from Oracle sequences
  * (OrthologRelationDao.java:621-642 and the GENETOGENE insert wrapper);
  * set-wise, new rows get startAt+1..startAt+N in a deterministic order.
  * The naive `row_number().over(Window.orderBy(...))` computes that rank
  * on a SINGLE partition (Spark warns "No Partition Defined for Window
  * operation") - a scale-killer for large insert sets. Here the rows are
  * range-partitioned and sorted by the order columns (a global sort
  * across partitions) and numbered with RDD `zipWithIndex`, which stays
  * fully distributed at the cost of one extra partition-size count job.
  *
  * `order` must be a UNIQUE total order over `df` for the assignment to
  * be deterministic.
  */
object Keys {

  def assignSequential(df: DataFrame, keyCol: String, startAt: Long,
                       order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(keyCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (startAt + idx + 1))
    }
    spark.createDataFrame(rdd, schema)
  }
}
