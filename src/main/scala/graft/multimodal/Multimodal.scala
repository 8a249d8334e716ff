package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, batch-decoded via mapPartitions (the
  * Scala equivalent of the mapInPandas batch-UDF pattern).
  *
  * The decode step routes by payload SIGNATURE: JPEG/PNG payloads go
  * through a REAL codec (the JDK's `javax.imageio` — no external
  * dependency) producing true dimensions, band count, and a normalized
  * 8-bin luminance histogram as the feature vector; any other payload
  * (the testdata's text stand-ins included) falls back to the
  * deterministic pseudo-codec, so the catalog gate stays a pure
  * function of the bytes on every engine. Heavier codecs (video,
  * audio) would slot behind the same signature switch.
  *
  * Scale notes: payloads stay as binary columns end-to-end (no
  * driver-side collection); decode runs per-partition so a codec's
  * native context is initialized once per partition, not per row —
  * exactly how a 100 TB media corpus pass should be shaped.
  */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("byte_len", LongType, nullable = true),
    StructField("source", StringType, nullable = true)))

  /** Wrap any table with a string payload column into the media schema
    * (the testdata's documents stand in for binary payloads). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              modality: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(modality).as("modality"),
      col(payloadCol).cast("binary").as("payload"),
      length(col(payloadCol).cast("binary")).cast("long").as("byte_len"),
      col(sourceCol).as("source"))

  /** Deterministic pseudo-decode for payloads no codec claims: derives
    * reproducible metadata from the payload bytes so downstream plumbing
    * (schema, joins, aggregations) is fully exercisable on non-media
    * testdata. */
  private def stubDecode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    if (payload == null || payload.isEmpty) (0, 0, 0, Array.empty[Float])
    else {
      val h = java.util.Arrays.hashCode(payload)
      val w = 64 + math.floorMod(h, 960)
      val ht = 64 + math.floorMod(h / 7, 960)
      val feats = Array.tabulate(8)(i =>
        math.floorMod(h / (i + 1), 1000) / 1000.0f)
      (w, ht, 3, feats)
    }
  }

  /** Magic-byte signature check: PNG (89 'PNG') or JPEG (FF D8 FF).
    * Routing on the signature — not on a try-decode — keeps the stub
    * path untouched for non-media payloads. */
  private[graft] def isImagePayload(p: Array[Byte]): Boolean =
    p != null && p.length >= 4 &&
      ((p(0) == 0x89.toByte && p(1) == 'P'.toByte &&
        p(2) == 'N'.toByte && p(3) == 'G'.toByte) ||
       (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte))

  /** REAL image decode via the JDK codec: true (width, height, bands)
    * plus a normalized 8-bin luminance histogram — a deterministic,
    * library-independent feature vector. Returns None on a payload the
    * codec rejects (caller falls back to the pseudo-decode, so a
    * corrupt file degrades instead of failing the pass). */
  private def imageDecode(payload: Array[Byte])
      : Option[(Int, Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val bands = img.getRaster.getNumBands
        val hist = new Array[Float](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y) // sRGB regardless of storage model
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            hist(math.min(7, lum / 32)) += 1f
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        var i = 0
        while (i < 8) { hist(i) /= n; i += 1 }
        Some((w, h, bands, hist))
      }
    } catch { case _: Exception => None }

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false),
    StructField("byte_len", LongType, nullable = true)))

  /** Batch decode via mapPartitions: one decoder context per partition,
    * rows streamed through it. */
  def decode(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    media.select("media_id", "modality", "payload", "byte_len")
      .mapPartitions { rows =>
        // per-partition decoder boundary: a heavier codec would init its
        // native context here, once, and stream the partition through it
        rows.map { r =>
          val p = r.getAs[Array[Byte]]("payload")
          val (w, h, c, f) =
            if (isImagePayload(p)) imageDecode(p).getOrElse(stubDecode(p))
            else stubDecode(p)
          Row(r.getAs[Long]("media_id"), r.getAs[String]("modality"),
            w, h, c, f, r.getAs[Long]("byte_len"))
        }
      }(enc)
  }

  /** Resize plan over decoded media: aspect-preserving fit into a target
    * box — pure column math on the metadata (the pixel pass itself lives
    * behind the same per-partition decoder boundary as `decode`). Emits
    * the scale factors a real resampler consumes. */
  def resize(decoded: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val sx = lit(targetW.toDouble) / col("width")
    val sy = lit(targetH.toDouble) / col("height")
    val s = least(sx, sy)
    decoded
      .filter(col("width") > 0 && col("height") > 0)
      .select(col("media_id"), col("modality"), col("width"), col("height"),
        round(s, 6).as("scale"),
        greatest(round(col("width") * s).cast("int"), lit(1)).as("out_width"),
        greatest(round(col("height") * s).cast("int"), lit(1)).as("out_height"))
  }

  /** Frame-sample stand-in for video: pick every k-th "frame" offset of
    * the payload deterministically — exercises the explode/array shape a
    * real frame sampler produces. */
  def frameSample(media: DataFrame, everyK: Int = 100): DataFrame =
    media.select(col("media_id"),
        posexplode(sequence(lit(0L),
          greatest(floor((col("byte_len") - 1) / everyK).cast("long"), lit(0L))))
          .as(Seq("frame_no", "offset_idx")))
      .select(col("media_id"), col("frame_no"),
        (col("offset_idx") * everyK).as("byte_offset"))
}
