package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, batch-decoded via mapPartitions (the
  * Scala equivalent of the mapInPandas batch-UDF pattern).
  *
  * The decode step itself is a DETERMINISTIC STUB — codec libraries are
  * not in this container by design. Everything around it is real and
  * tested: the schema contract, the partition-level batch shape, null
  * handling, and metadata extraction. Swapping `stubDecode` for a JNI
  * or library decoder changes one function.
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

  /** Deterministic fake "decode": a real decoder returns (width, height,
    * channels, features); the stub derives them reproducibly from the
    * payload bytes so downstream plumbing (schema, joins, aggregations)
    * is fully exercisable. Marked for replacement. */
  private def stubDecode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    // ??? <- real codec goes here; stub derives deterministic pseudo-
    // metadata from payload content
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
        // decoder init would happen here, once per partition
        rows.map { r =>
          val (w, h, c, f) = stubDecode(r.getAs[Array[Byte]]("payload"))
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
