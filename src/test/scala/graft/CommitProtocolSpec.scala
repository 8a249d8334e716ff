package graft

import org.apache.spark.sql.functions._

/** The portability proof for the lakehouse commit seam: the s20
  * manifest protocol's reader-invisibility must not depend on POSIX
  * `ATOMIC_MOVE`. [[graft.core.ObjectStoreSim]] re-runs the full
  * vacuum commit with the pointer flip downgraded to what an object
  * store offers — COPY (whole-object PUT) + DELETE with no atomicity
  * across the pair, per-object deletes with no atomicity across a
  * partition dir — and a crash injected before EVERY individual
  * object operation. At each crash point a fresh reader must resolve
  * a complete old version or a complete new version, never a mix and
  * never debris. */
class CommitProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = {
    val root = java.nio.file.Files.createTempDirectory("commit_proto")
      .toString
    spark.range(400).toDF("id")
      .withColumn("dvid", (pmod(col("id"), lit(4)) + 1).cast("int"))
      .repartition(3) // >1 data file per partition: delete crash points
                      // must land MID-partition, not only between dirs
      .write.partitionBy("dvid").parquet(s"$root/data")
    graft.catalog.Relational.s20CommitManifest(root, 1, Seq(1, 2, 3, 4))
    root
  }

  private def readIds(root: String): Set[Long] =
    graft.catalog.Relational.s20ReadViaManifest(spark, root)
      .select("id").as[Long].collect().toSet

  /** The s20 TTL job under a given protocol: commit the post-TTL
    * manifest (readers instantly retarget), then physically delete
    * what no manifest references. */
  private def vacuum(root: String, proto: graft.core.ObjectStoreSim): Unit = {
    graft.catalog.Relational.s20CommitManifest(root, 2, Seq(3, 4), proto)
    proto.deleteDir(s"$root/data/dvid=1")
    proto.deleteDir(s"$root/data/dvid=2")
  }

  test("manifest reads stay coherent at EVERY crash point of a copy+delete commit") {
    val all = (0L until 400L).toSet
    val retained = all.filter(id => id % 4 + 1 >= 3)
    // un-crashed run: count the protocol's total object operations and
    // pin the end state to the POSIX protocol's
    val clean = freshRoot()
    val proto0 = new graft.core.ObjectStoreSim()
    vacuum(clean, proto0)
    assert(readIds(clean) === retained,
      "object-store protocol's final state diverged from the POSIX one")
    val total = proto0.stepsTaken
    assert(total >= 10, s"expected per-object delete steps, saw only $total")
    for (k <- 0 until total) {
      val root = freshRoot()
      try {
        vacuum(root, new graft.core.ObjectStoreSim(crashAfter = k))
        fail(s"crashAfter=$k did not crash")
      } catch { case _: graft.core.SimulatedCrash => () }
      val got = readIds(root)
      assert(got === all || got === retained,
        s"crash point $k: reader saw a TORN state " +
          s"(${got.size} ids; old=${got == all}, new=${got == retained})")
    }
  }

  test("partition enumeration seam lists exactly the hive dirs, values sorted") {
    val root = java.nio.file.Files.createTempDirectory("commit_parts")
      .toString + "/store"
    Seq((1L, "2024-02"), (2L, "2024-01"), (3L, "2024-02"))
      .toDF("k", "month").write.partitionBy("month").parquet(root)
    assert(graft.core.PosixCommit.partitions(root, "month") ===
      Seq("2024-01", "2024-02"))
    assert(graft.core.PosixCommit.partitions(root, "nope") === Seq.empty)
  }
}
