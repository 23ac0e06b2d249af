package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads ride as opaque `binary`
  * columns with typed metadata structs; decode / feature-extract /
  * frame-sample run per-partition in batches (the Scala analog of
  * `mapInPandas` — an iterator-to-iterator `mapPartitions`, so one
  * executor task streams through a whole parquet row-group without
  * per-row overhead and without materializing the partition).
  *
  * The actual codec calls are STUBBED (this container has no image/audio
  * libraries): `decodeDims`/`pixelHistogram` below compute a
  * deterministic fake from the raw bytes, clearly marked. The Spark-side
  * plumbing — schema, binary transport, batch shape, partition-parallel
  * execution — is real and tested.
  */
object Multimodal {

  /** Media metadata schema carried next to every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("histogram", ArrayType(LongType))))

  /** Wrap a DataFrame's string column as a binary media column + metadata
    * struct (testdata carries no real media; documents' text bytes stand
    * in for payloads). */
  def attachBinary(df: DataFrame, idCol: String,
                   payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("media"),
      struct(lit("fake/raw").as("format"),
        length(col(payloadCol)).cast("long").as("n_bytes")).as("meta"))

  // ---- STUB: a real implementation would call an image codec here. ----
  /** Deterministic fake "decode": dims derived from the byte length. */
  private def decodeDims(bytes: Array[Byte]): (Int, Int) =
    ((bytes.length % 1024) + 1, (bytes.length % 768) + 1)

  /** Deterministic fake "pixel histogram": 8 buckets over byte values. */
  private def pixelHistogram(bytes: Array[Byte]): Array[Long] = {
    val h = new Array[Long](8)
    var i = 0
    while (i < bytes.length) {
      h((bytes(i) & 0xFF) >> 5) += 1
      i += 1
    }
    h
  }
  // ---------------------------------------------------------------------

  /** Batch "decode": per-partition iterator pipeline over the binary
    * column, emitting [[decodedSchema]] rows. */
  def decode(media: DataFrame): DataFrame = {
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select("id", "media", "meta.format")
      .mapPartitions { it =>
        it.map { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          val (w, h) = decodeDims(bytes)
          Row(r.getAs[Long]("id"), r.getAs[String]("format"), w, h,
            pixelHistogram(bytes).toSeq)
        }
      }(enc)
  }

  /** "Resize" to a byte budget: the stub resampler keeps every k-th byte
    * (deterministic); a real implementation would decode, resample
    * pixels, re-encode. Output keeps the media-column shape (binary +
    * refreshed metadata), so resize composes with [[decode]] /
    * [[sampleFrames]] downstream like any other media frame. */
  def resize(media: DataFrame, maxBytes: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("media", BinaryType),
      StructField("meta", metaSchema)))
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    media.select("id", "media", "meta.format").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        // ---- STUB: real codec would resample pixels, not bytes ----
        val out =
          if (bytes.length <= maxBytes) bytes
          else {
            val step = math.ceil(bytes.length.toDouble / maxBytes).toInt
            (0 until bytes.length by step).map(bytes).toArray
          }
        Row(r.getAs[Long]("id"), out,
          Row(r.getAs[String]("format"), out.length.toLong))
      }
    }(enc)
  }

  /** Frame sampling stub for "video" payloads: slice `n` evenly-spaced
    * byte windows as stand-in frames; emits one row per frame with the
    * frame index — the real operator's output shape. */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    media.select("id", "media").mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        val id = r.getAs[Long]("id")
        (0 until n).iterator.map { f =>
          val start =
            if (bytes.length <= frameBytes) 0
            else (bytes.length - frameBytes).toLong * f / math.max(n - 1, 1)
          Row(id, f, bytes.slice(start.toInt,
            math.min(start.toInt + frameBytes, bytes.length)))
        }
      }
    }(enc)
  }
}
