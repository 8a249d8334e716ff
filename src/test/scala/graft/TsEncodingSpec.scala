package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins `Tables.events` against every `ts` encoding the testdata driver
  * has shipped — TIMESTAMP(NANOS) (read as nanos-since-epoch LongType
  * under the nanosAsLong legacy flag), TIMESTAMP_NTZ micros, and
  * UTC-adjusted TIMESTAMP micros — and the footer-stats fast path that
  * must agree with a full scan under each of them. Round 6 regressed
  * because only the first encoding had a loader branch. */
class TsEncodingSpec extends SparkSpec {
  import spark.implicits._

  private val micros = Seq(
    1500000000000000L, 1500000123456789L, 1600000987654321L)

  private def stage(name: String)(write: String => Unit): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_tsenc_$name").toString
    write(dir)
    dir
  }

  private def loadedMicros(dir: String): Seq[Long] = {
    val ev = graft.core.Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType,
      s"loader must normalize to session-TZ timestamp, got ${ev.schema("ts").dataType}")
    ev.select(unix_micros($"ts")).as[Long].collect().toSeq.sorted
  }

  test("events loader yields identical micros for NANOS-long, NTZ, and LTZ encodings") {
    // the NANOS file reaches the loader as a LongType column of nanos
    // (that is what spark.sql.legacy.parquet.nanosAsLong=true produces),
    // so a LongType nanos fixture exercises exactly that branch
    val nanosDir = stage("nanos") { d =>
      micros.map(_ * 1000L).toDF("ts")
        .withColumn("event_id", monotonically_increasing_id())
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val ntzDir = stage("ntz") { d =>
      micros.toDF("us")
        .select(timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
        .withColumn("event_id", monotonically_increasing_id())
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val ltzDir = stage("ltz") { d =>
      micros.toDF("us").select(timestamp_micros($"us").as("ts"))
        .withColumn("event_id", monotonically_increasing_id())
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val expected = micros.sorted
    assert(loadedMicros(nanosDir) === expected)
    assert(loadedMicros(ntzDir) === expected)
    assert(loadedMicros(ltzDir) === expected)
  }

  test("footer ts range agrees with the scan for the shipped testdata encoding") {
    // whatever encoding the driver generated, the footer fast path must
    // either refuse (None) or agree exactly with the relational truth
    val path = s"$sfDir/events.parquet"
    val ev = graft.core.Tables.events(spark, sfDir)
    val Array(lo, hi) = ev
      .agg(min(unix_micros($"ts")), max(unix_micros($"ts")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    graft.catalog.ScaleOps.tsRangeFromFooter(spark, path) match {
      case Some(Array(flo, fhi)) =>
        assert(flo === lo); assert(fhi === hi)
      case other => fail(s"footer stats should be readable for the shipped testdata, got $other")
    }
  }

  test("footer ts range handles NTZ and LTZ micros fixtures") {
    // LTZ must be written as annotated INT64 micros — Spark's default
    // INT96 carries no logical type and the footer path correctly
    // refuses it (None → relational fallback)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try for (ntz <- Seq(true, false)) {
      val dir = stage(if (ntz) "f_ntz" else "f_ltz") { d =>
        val base = micros.toDF("us").select(timestamp_micros($"us").as("t"))
        val withTs = if (ntz) base.select($"t".cast(TimestampNTZType).as("ts"))
                     else base.select($"t".as("ts"))
        withTs.coalesce(1).write.mode("overwrite").parquet(s"$d/ev")
      }
      val file = new java.io.File(s"$dir/ev").listFiles()
        .filter(f => f.getName.endsWith(".parquet")).head.getPath
      graft.catalog.ScaleOps.tsRangeFromFooter(spark, file) match {
        case Some(Array(flo, fhi)) =>
          assert(flo === micros.min); assert(fhi === micros.max)
        case other => fail(s"expected footer stats for ${if (ntz) "NTZ" else "LTZ"}, got $other")
      }
    } finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
  }
}
