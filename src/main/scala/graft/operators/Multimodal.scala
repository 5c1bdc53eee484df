package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` content columns + typed metadata, with
  * decode / feature-extract / resize / frame-sample stages.
  *
  * The actual media codecs are STUBBED behind deterministic fakes (this
  * container ships no image/audio libraries) — what is real, and what the
  * tests cover, is the Spark-side plumbing a 100-TB media pipeline needs:
  * the binary schema, partition-parallel `mapPartitions` batch shape, typed
  * Encoders, and the column-expression fast paths. Swapping `fakeDecode`
  * for a JNI/ffmpeg call changes no plan shape.
  *
  * Scale notes: binary payloads ride through Spark's unsafe row format;
  * per-partition iteration (not per-row lambdas through Catalyst) is the
  * right batch shape for codec calls because it amortizes native-library
  * setup per partition — the same reason PySpark uses mapInPandas batches.
  */
object Multimodal {

  /** Typed metadata for an opaque media blob. */
  case class MediaMeta(kind: String, width: Int, height: Int, channels: Int,
      durationMs: Long)

  case class MediaRow(id: Long, content: Array[Byte])
  case class DecodedRow(id: Long, meta: MediaMeta, nBytes: Long)
  case class FeatureRow(id: Long, features: Array[Float])

  /** Attach a binary content column derived from a string column (the
    * testdata stand-in for reading real media bytes; a production source
    * would be [[readBinaryDir]]). */
  def withBlob(df: DataFrame, textCol: String, blobCol: String = "content"): DataFrame =
    df.withColumn(blobCol, encode(col(textCol), "UTF-8"))

  /** The real media source: Spark's binaryFile format — one row per file
    * with (path, modificationTime, length, content). `pathGlobFilter`
    * selects the media type; partition parallelism comes from the file
    * listing, so a 100-TB image corpus scans exactly like parquet. */
  def readBinaryDir(spark: org.apache.spark.sql.SparkSession, dir: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** STUB decode — deterministic fake: metadata derived from the content
    * hash, standing in for an image/audio header parse. Column-expression
    * path (no shuffle, codegen-friendly). */
  def decodeMeta(content: Column): Column = {
    val h = abs(xxhash64(content))
    struct(
      when(pmod(h, lit(3)) === 0, "image").when(pmod(h, lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      (pmod(h, lit(1920)) + 1).cast("int").as("width"),
      (pmod(h, lit(1080)) + 1).cast("int").as("height"),
      (pmod(h, lit(3)) + 1).cast("int").as("channels"),
      pmod(h, lit(600000)).as("durationMs"))
  }

  /** Frame/byte sampling: every `stride`-th byte of the blob, HEX-ENCODED
    * into a string column (the plan shape of video frame-sampling: a per-row
    * projection, no shuffle). Null blobs stay null. */
  def sampleBytes(content: Column, stride: Int): Column =
    when(content.isNull, lit(null).cast("string"))
      .otherwise(array_join(transform(
        sequence(lit(1), greatest(octet_length(content), lit(1)), lit(stride)),
        i => hex(substring(content, i, lit(1)))), ""))

  /** Feature extraction over partitions — the genuine `mapPartitions` batch
    * shape a codec-backed featurizer needs. The per-blob featurizer itself is
    * a deterministic fake ([[fakeFeatures]]); real deployments swap in the
    * native call and keep this exact plumbing. */
  def featurize(media: Dataset[MediaRow], dim: Int): Dataset[FeatureRow] = {
    require(dim > 0, s"feature dim must be positive, got $dim")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup would open the native codec ONCE here; null
      // blobs featurize like empty ones instead of NPE-ing the task
      rows.map { r =>
        val bytes = if (r.content == null) Array.empty[Byte] else r.content
        FeatureRow(r.id, fakeFeatures(bytes, dim))
      }
    }
  }

  /** Deterministic fake featurizer: rolling-hash byte histogram folded into
    * `dim` float buckets — reproducible across executors and runs. */
  def fakeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      acc(((h % dim).toInt + dim) % dim) += 1.0f
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    var j = 0
    while (j < dim) { acc(j) /= n; j += 1 }
    acc
  }
}
