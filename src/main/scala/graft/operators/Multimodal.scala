package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.10): image/audio/video as
  * opaque `binary` payloads + typed metadata struct, with
  * decode / feature-extract / resize / frame-sample stages.
  *
  * The Spark-side plumbing (schema, batch shape, partition-parallel
  * processing, deterministic output) is real and tested; the actual media
  * DECODE is a clearly-marked STUB (`fakeDecodeFeatures`) because no
  * image/audio codec libraries exist in this container — it derives a
  * deterministic pseudo-feature vector from the payload bytes so the
  * pipeline shape (binary → fixed-width float features) is exercised
  * end-to-end. Swap `fakeDecodeFeatures` for a real JNI/codec call at the
  * same signature to productionize.
  */
object Multimodal {

  /** Canonical multimodal schema: payload + metadata struct. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              mediaType: String): DataFrame =
    df.select(col(idCol).as("media_id"),
      col(payloadCol).as("payload"),
      struct(lit(mediaType).as("media_type"),
        length(col(payloadCol)).as("n_bytes"),
        md5(col(payloadCol)).as("checksum")).as("meta"))

  /** STUB decode: deterministic 8-dim pseudo-feature vector from the
    * payload's md5 bytes (each pair of hex chars → [0,1)). Real decoders
    * (JPEG/PNG/audio PCM) plug in here — same signature, same batch
    * shape: binary in, fixed-width array<double> out, row-parallel. */
  def fakeDecodeFeatures(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(7)), i =>
      conv(substring(md5(payload), i * 2 + 1, lit(2)), 16, 10).cast("double") / 255.0)

  /** Feature-extraction stage over a media frame. */
  def extractFeatures(media: DataFrame): DataFrame =
    media.withColumn("features", fakeDecodeFeatures(col("payload")))

  /** The same decode stage as partition-batched JVM code — the Scala
    * analog of a pandas mapInPandas decode (how a REAL codec would run:
    * one library context opened per partition, rows streamed through it).
    * Emits (media_id, features), byte-identical to [[extractFeatures]];
    * ExtSpec asserts the equivalence. */
  def extractFeaturesMapPartitions(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // a real decoder would open its codec context HERE, once per
        // partition, and close it when the iterator drains
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, payload) =>
          md.reset()
          val h = md.digest(payload)
          (id, (0 until 8).map(i => (h(i) & 0xFF).toDouble / 255.0).toArray)
        }
      }
      .toDF("media_id", "features")
  }

  /** "Resize" stub: truncate/pad payload to `target` bytes — stands in for
    * a real resample; keeps the metadata consistent. */
  def resizeStub(media: DataFrame, target: Int): DataFrame =
    media.withColumn("payload",
      substring(col("payload"), 1, target))
      .withColumn("meta", struct(col("meta.media_type"),
        length(col("payload")).as("n_bytes"), md5(col("payload")).as("checksum")))

  /** Frame-sampling stub for video-like payloads: split the payload into
    * fixed-size "frames" and keep every `stride`-th — exercises the
    * explode/posexplode shape a real frame sampler needs. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(col("media_id"),
      posexplode(transform(
        sequence(lit(0), greatest(
          floor((length(col("payload")) - 1) / lit(frameBytes)).cast("int"), lit(0))),
        i => substring(col("payload"), i * frameBytes + 1, lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
      .filter(col("frame_idx") % stride === 0)
      .withColumn("frame_checksum", md5(col("frame")))
      .drop("frame")
}
