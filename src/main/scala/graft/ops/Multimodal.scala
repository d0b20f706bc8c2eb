package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, and run decode/feature-extraction as a
  * partition-wise batch operator.
  *
  * The decode step is a clearly-marked STUB (this container has no
  * image/audio codecs): `stubDecodeFeatures` derives a deterministic
  * 8-dim feature from the raw bytes. The Spark-side plumbing — binary
  * schema, metadata struct, `mapPartitions` batching, output schema —
  * is real and is what a production decoder (JNI/FFI or Arrow-batched
  * Python) would plug into.
  */
object Multimodal {

  /** Wrap a text table as a blob table: `(doc_id, blob, meta)` where meta
    * carries byte length + md5 — the shape an image/audio lakehouse table
    * would have. */
  def asBlobTable(docs: DataFrame, idCol: String, payloadCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      col(payloadCol).cast("binary").as("blob"),
      struct(
        octet_length(col(payloadCol)).as("byte_len"),
        md5(col(payloadCol).cast("binary")).as("digest")).as("meta"))

  val FeatureDim = 8

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("feature", ArrayType(FloatType, containsNull = false))))

  /** STUB decoder: mean byte value over FeatureDim equal strides of the
    * blob, scaled to [0,1]. A real implementation decodes the codec here
    * (per-partition batch, exactly this signature). Deterministic, so
    * tests and the driver's rows-check are stable. */
  def stubDecodeFeatures(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    val rows = blobs.select(col("doc_id").cast("long"), col("blob")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val feat = new Array[Float](FeatureDim)
          // null payload → zero feature vector, never an executor NPE
          if (bytes != null && bytes.nonEmpty) {
            val stride = math.max(bytes.length / FeatureDim, 1)
            var d = 0
            while (d < FeatureDim) {
              var sum = 0L; var n = 0
              var i = d * stride
              val end = if (d == FeatureDim - 1) bytes.length else math.min((d + 1) * stride, bytes.length)
              while (i < end) { sum += bytes(i) & 0xFF; n += 1; i += 1 }
              feat(d) = if (n == 0) 0f else (sum.toFloat / n) / 255f
              d += 1
            }
          }
          Row(id, feat.toSeq)
        }
      }
    spark.createDataFrame(rows, featureSchema)
  }
}
