package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample plumbing.
  *
  * The actual codec step is STUBBED - this container has no image/audio
  * libraries - behind `fakeDecodeFeatures`, a deterministic
  * hash-derived feature vector clearly marked as a stand-in. Everything
  * around it (schema, partitioning, batch shape, pruning-friendly
  * metadata) is real: swapping the stub for a JNI/FFI decoder changes
  * one expression, not the pipeline.
  *
  * Scale notes: binaries stay opaque end-to-end (no decode before
  * filter); metadata lives in a sibling struct so planners prune the
  * (huge) binary column away for metadata-only queries - the same layout
  * parquet uses for its column statistics.
  */
object Multimodal {

  /** Canonical asset schema: id + media type + raw bytes + typed
    * metadata struct. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("media_type", StringType), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("codec", StringType)
    )))
  ))

  /** Build an asset table from any (id, payload-string) source - used by
    * tests and the documents-table demo; payload bytes stand in for real
    * media. Metadata is synthesized deterministically from the payload
    * length and id - plain integer arithmetic, so an external engine can
    * recompute it (the driver's DuckDB oracle checks both registered
    * multimodal queries end-to-end). */
  def syntheticAssets(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    val len = length(col(payloadCol)).cast("long")
    df.select(
      id.as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(id, lit(3)) + 1).cast("int")).as("media_type"),
      col(payloadCol).cast("binary").as("bytes"),
      struct(
        (pmod(len * 7 + id * 13, lit(1920)) + 1).cast("int").as("width"),
        (pmod(len * 11 + id * 17, lit(1080)) + 1).cast("int").as("height"),
        (pmod(len * 7919 + id * 31, lit(600000)) + 1).cast("int").as("duration_ms"),
        lit(16000).as("sample_rate"),
        lit("synthetic").as("codec")).as("meta"))
  }

  /** STUB: deterministic fake "decode + feature extraction".
    *
    * A real implementation decodes `bytes` with an image/audio codec and
    * runs a feature extractor over pixel/sample batches; here each of the
    * `dim` features is a hash of (bytes, i) scaled to [0,1). The
    * signature - binary in, fixed-width float vector out, computed
    * per-row inside codegen - is exactly what the real kernel must
    * satisfy, so the surrounding pipeline (partitioning, batch shape,
    * downstream ANN) is fully exercised.
    */
  def fakeDecodeFeatures(bytes: Column, dim: Int = 16): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(bytes, i), lit(100000)).cast("double") / 100000.0)
        .cast("float"))

  /** STUB resize: a real kernel reencodes pixels; the fake derives new
    * metadata and rehashes the payload so downstream stages see a
    * changed asset. The metadata math (aspect-preserving clamp) is real. */
  def resizeTo(df: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(1.0), lit(maxSide).cast("double") / greatest(w, h))
    df.withColumn("meta", struct(
      ceil(w * scale).cast("int").as("width"),
      ceil(h * scale).cast("int").as("height"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.codec").as("codec")))
  }

  /** Frame sampling plumbing: one output row per sampled frame at
    * `everyMs` intervals, frame payload stubbed as (bytes, frameIdx)
    * hash. posexplode keeps it a generator - no driver involvement. */
  def sampleFrames(df: DataFrame, everyMs: Int): DataFrame =
    df.filter(col("media_type") === "video")
      .select(col("asset_id"), col("meta"),
        posexplode(sequence(lit(0),
          greatest((col("meta.duration_ms") / everyMs).cast("int") - 1, lit(0)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumn("frame_ts_ms", col("frame_idx") * everyMs)
      .withColumn("frame_features", fakeDecodeFeatures(
        concat(col("asset_id").cast("string"), col("frame_idx").cast("string"))
          .cast("binary")))
      .drop("col")

  /** Metadata-only projection: proves the binary column prunes out of
    * the scan (assert `ReadSchema` excludes `bytes` in the plan). */
  def metadataOnly(df: DataFrame): DataFrame =
    df.select(col("asset_id"), col("media_type"),
      col("meta.width"), col("meta.height"), col("meta.duration_ms"))
}
