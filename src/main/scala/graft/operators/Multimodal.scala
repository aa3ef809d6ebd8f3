package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.10): image/audio/video as
  * opaque `binary` payloads + typed metadata struct, with
  * decode / feature-extract / resize / frame-sample stages.
  *
  * IMAGE decode is REAL: [[decodeImages]] runs the JDK's built-in
  * `javax.imageio` PNG codec partition-parallel (no external codec
  * dependency), and `x_image_decode` checks the DECODED CONTENT —
  * dimensions and channel averages — against generator-known values.
  * AUDIO decode is REAL too: [[decodeWavs]] runs the JDK's built-in
  * `javax.sound.sampled` WAV/PCM codec the same way, and
  * `x_audio_decode` checks decoded sample statistics against the
  * closed form of the synthesized waveform. Only VIDEO decode remains a
  * clearly-marked stub (`fakeDecodeFeatures` / [[sampleFrames]]): no
  * video codec exists in the JDK — swap in a JNI/codec call at the same
  * signature (binary in, fixed-width features out, row-parallel) to
  * productionize.
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

  /** Synthesize one tiny real PNG per id, executor-side: dimensions and
    * colors are CLOSED-FORM in the id (w = 8+id%9, h = 8+id%7, solid
    * (37id, 59id, 83id) mod 256 with the top-left pixel inverted), so a
    * SQL oracle can predict what a correct decode must read back —
    * content-level verification without binary fixtures on disk. PNG is
    * lossless and the JDK codec is deterministic, making the
    * encode→decode round trip exact. */
  def synthPngs(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (w, h) = (8 + (id % 9).toInt, 8 + (id % 7).toInt)
        val (r, g, b) =
          ((id * 37 % 256).toInt, (id * 59 % 256).toInt, (id * 83 % 256).toInt)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val solid = (r << 16) | (g << 8) | b
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, solid); x += 1 }
          y += 1
        }
        img.setRGB(0, 0, ((255 - r) << 16) | ((255 - g) << 8) | (255 - b))
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        (id, out.toByteArray)
      }
    }.toDF("media_id", "payload")
  }

  /** REAL image decode: `javax.imageio` per partition (the codec context
    * pattern a native decoder needs — decode happens on executors, rows
    * stream through). Emits dimensions + per-channel averages; an
    * undecodable payload yields nulls rather than killing the job (the
    * standard quarantine-don't-crash posture for dirty media columns). */
  def decodeImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = try {
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes)))
          } catch { case scala.util.control.NonFatal(_) => None }
          img match {
            case Some(im) =>
              val (w, h) = (im.getWidth, im.getHeight)
              var (sr, sg, sb) = (0L, 0L, 0L)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = im.getRGB(x, y)
                  sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
                  x += 1
                }
                y += 1
              }
              val n = w.toLong * h
              (id, Some(w), Some(h), Some(sr.toDouble / n),
                Some(sg.toDouble / n), Some(sb.toDouble / n))
            case None => (id, None, None, None, None, None)
          }
        }
      }
      .toDF("media_id", "width", "height", "avg_r", "avg_g", "avg_b")
  }

  /** Synthesize one tiny real PCM16 mono WAV per id through the JDK's
    * own WAV ENCODER (`AudioSystem.write` — a real codec round trip, not
    * hand-packed bytes). The waveform is CLOSED-FORM in the id:
    * n = 32 + id%33 samples at 8 kHz, sample i =
    * ((id·73 + i·37) mod 4096) − 2048 — pure integer arithmetic a SQL
    * oracle can replay, so a correct decode is verifiable at the
    * sample-statistics level without binary fixtures on disk. */
  def synthWavs(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val n = 32 + (id % 33).toInt
        val pcm = java.nio.ByteBuffer.allocate(n * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        (0 until n).foreach { i =>
          pcm.putShort((((id * 73 + i.toLong * 37) % 4096) - 2048).toShort)
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm.array()), fmt, n.toLong)
        val out = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        (id, out.toByteArray)
      }
    }.toDF("media_id", "payload")
  }

  /** REAL audio decode: the JDK's `javax.sound.sampled` WAV reader, one
    * codec context per partition like [[decodeImages]]. Emits the audio
    * statistics a curation pipeline filters on — duration, amplitude
    * sums, peak, zero-crossing count — all integer-exact for PCM16 so
    * they replay in portable SQL. Undecodable payloads quarantine to
    * nulls rather than killing the job. */
  def decodeWavs(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
              !fmt.isBigEndian)
            val raw = ais.readAllBytes()
            val bb = java.nio.ByteBuffer.wrap(raw)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val n = raw.length / 2
            var (sumAmp, sumSq, crossings) = (0L, 0L, 0L)
            var (peak, prevSign) = (0, 0)
            var i = 0
            while (i < n) {
              val s = bb.getShort(i * 2).toInt
              sumAmp += s; sumSq += s.toLong * s
              if (math.abs(s) > peak) peak = math.abs(s)
              val sign = if (s < 0) -1 else 1
              if (i > 0 && sign != prevSign) crossings += 1
              prevSign = sign
              i += 1
            }
            val rate = fmt.getSampleRate.toInt
            (id, Some(rate), Some(n.toLong),
              Some(n.toLong * 1000000L / rate), Some(sumAmp), Some(sumSq),
              Some(peak), Some(crossings))
          } catch {
            case scala.util.control.NonFatal(_) =>
              (id, None, None, None, None, None, None, None)
          }
        }
      }
      .toDF("media_id", "sample_rate", "n_samples", "duration_us",
        "sum_amp", "sum_sq", "peak", "zero_crossings")
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
