package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed persistence for the engine's state tables.
  *
  * At cluster scale the state tables (orthologs, associations, xrefs,
  * genes) are read at the start of every run and joined on the same keys
  * every time (srcRgdId / rgdId / accId). Writing them bucketed on those
  * keys makes every state<->state and incoming<->state equi-join
  * co-located: Spark plans a SortMergeJoin/ShuffleHashJoin with NO
  * Exchange on the bucketed side(s), so the dominant shuffle of a run
  * disappears. `StateStoreSpec` pins the no-exchange property on the
  * physical plan.
  *
  * Bucket count is a table property frozen at write time: pick it for the
  * TARGET scale (buckets ~ table size / 128 MB), not the test scale - a
  * 100 TB ortholog table at 128 MB/bucket is ~800k buckets, far above any
  * sane shuffle.partitions, so in practice state tables bucket at
  * 4096-16384 and incoming batches shuffle TO the bucket layout (one
  * exchange on the small side only).
  */
object StateStore {

  /** Write `df` as a bucketed, bucket-sorted table. Bucketed writes go
    * through the catalog (`saveAsTable`) - plain `parquet(path)` cannot
    * record bucket metadata.
    *
    * The write first shuffles INTO the bucket layout:
    * `repartition(buckets, keys)` uses the same `pmod(murmur3(keys), n)`
    * assignment as the bucket spec, so each write task holds exactly one
    * bucket and emits exactly one file. Without it every upstream map
    * partition writes its own file per bucket - a 64-partition frame
    * bucketed 16 ways emitted ~1000 tiny files per phase (measured on
    * the flagship: the `relations` phase wrote 1022 files, 4.5-8.9 s;
    * one-file-per-bucket cut it to 16 files). At target scale this
    * exchange is the documented pattern anyway (incoming batches shuffle
    * to the bucket layout; buckets are sized ~128 MB so the write tasks
    * stay balanced). The explicit partition count keeps AQE from
    * coalescing the exchange away. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int = 64, path: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.col
    val w = df.repartition(buckets, keys.map(col): _*).write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
