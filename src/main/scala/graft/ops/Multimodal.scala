package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media assets are opaque `binary` columns with typed metadata — the
  * pattern every large-scale multimodal corpus uses (the bytes travel
  * as parquet BINARY; schema + partitioning + batch shape are what the
  * engine owns). The container has no image/audio codecs, so the decode
  * kernels are DETERMINISTIC STUBS (clearly marked) — the Spark-side
  * plumbing (schema, `mapPartitions` batching, partition sizing) is
  * real and tested.
  *
  * Scale notes: media rows are fat (MBs), so ops here must (a) never
  * collect, (b) keep per-partition byte volume bounded — callers size
  * `spark.sql.files.maxPartitionBytes` down for media tables — and
  * (c) push metadata-only predicates (width/duration filters) BEFORE
  * any decode, which Catalyst does for free since metadata are plain
  * columns.
  */
object Multimodal {

  /** Typed metadata record for a decoded media asset. */
  final case class MediaMeta(
      id: Long,
      mediaType: String, // "image" | "audio" | "video"
      nBytes: Long,
      width: Int,
      height: Int,
      durationMs: Long)

  /** Wrap a text/id frame as a media frame: bytes + sidecar metadata
    * columns. In production the binary column comes straight off
    * parquet; here any string column can stand in as payload.
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(payloadCol), "UTF-8").as("bytes"),
      lit(mediaType).as("media_type"),
      octet_length(encode(col(payloadCol), "UTF-8")).cast("long").as("n_bytes"))

  /** STUB decode: derives deterministic pseudo-dimensions from the
    * payload bytes (first/last byte + length). A real deployment swaps
    * the body for an actual codec call; the signature — one partition
    * of byte arrays in, one iterator of typed metadata out, no
    * driver-side traffic — is the production shape.
    */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select("id", "bytes", "media_type").as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, mt) =>
          // ??? -- real codec goes here; deterministic fake below.
          val h = if (bytes.isEmpty) 0 else (bytes.head & 0xff)
          val t = if (bytes.isEmpty) 0 else (bytes.last & 0xff)
          MediaMeta(id, mt, bytes.length.toLong,
            width = 64 + h % 64, height = 64 + t % 64,
            durationMs = bytes.length.toLong * 10)
        }
      }
  }

  /** STUB feature extraction: fixed-size float vector per asset,
    * derived from byte histogram moments (deterministic fake of an
    * embedding-model call). Batch shape (mapPartitions, bounded output
    * width) is the real contract.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 8): DataFrame = {
    import spark.implicits._
    media.select("id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // Accumulate in DOUBLE, round to float once at the end — the
          // arithmetic any SQL engine reproduces exactly (float-by-float
          // accumulation would drift from the oracle's double sums).
          val v = Array.tabulate(dim) { i =>
            if (bytes.isEmpty) 0f
            else {
              var s = 0.0
              var j = i
              while (j < bytes.length) { s += (bytes(j) & 0xff); j += dim }
              (s / bytes.length).toFloat
            }
          }
          (id, v)
        }
      }.toDF("id", "features")
  }

  /** Frame sampling plan for video-typed rows: every `everyMs`
    * milliseconds up to the (stub-decoded) duration — the row explosion
    * is expressed relationally (explode of a sequence), so Catalyst
    * sees it and the decode stub runs once per asset, not per frame.
    */
  def sampleFrames(meta: Dataset[MediaMeta], everyMs: Long): DataFrame =
    meta.toDF()
      .filter(col("mediaType") === "video")
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), col("durationMs"), lit(everyMs))))
      .select(col("id"), col("frame_ts_ms"))
}
