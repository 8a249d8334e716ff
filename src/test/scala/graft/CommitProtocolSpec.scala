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

  // ---- r14: the artifact registry's named-pointer publish ----------

  private def buildArtifact(root: String, name: String, n: Int): Unit =
    spark.range(n).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/$name")

  test("artifact publish stays coherent at every crash point of the pointer PUT") {
    val root = java.nio.file.Files.createTempDirectory("art_pub").toString
    buildArtifact(root, "art__a", 5)
    buildArtifact(root, "art__b", 9)
    // un-crashed run: count the publish's object operations
    val p0 = new graft.core.ObjectStoreSim()
    p0.publish(root, "art", "art__a")
    val total = p0.stepsTaken
    assert(total >= 2, s"expected a multi-step naive publish, saw $total")
    for (k <- 0 until total) {
      new graft.core.ObjectStoreSim().publish(root, "art", "art__a")
      try {
        new graft.core.ObjectStoreSim(crashAfter = k)
          .publish(root, "art", "art__b")
        fail(s"crashAfter=$k did not crash")
      } catch { case _: graft.core.SimulatedCrash => () }
      val got = new graft.core.ObjectStoreSim().resolvePublished(root, "art")
      assert(got === "art__a" || got === "art__b",
        s"crash point $k: pointer resolved to debris '$got'")
      // the resolved build is COMPLETE — old has 5 rows, new has 9
      val rows = spark.read.parquet(s"$root/$got").count()
      assert(rows === (if (got == "art__a") 5L else 9L),
        s"crash point $k: resolved build '$got' incomplete ($rows rows)")
    }
    // a post-crash retry converges
    new graft.core.ObjectStoreSim().publish(root, "art", "art__b")
    assert(new graft.core.ObjectStoreSim()
      .resolvePublished(root, "art") === "art__b")
  }

  test("POSIX publish realizes the named pointer as a read-through symlink") {
    val root = java.nio.file.Files.createTempDirectory("art_posix").toString
    buildArtifact(root, "art__x", 5)
    buildArtifact(root, "art__y", 7)
    // a REAL dir left at the pointer path (pre-r13 scheme) is replaced
    buildArtifact(root, "art", 1)
    graft.core.PosixCommit.publish(root, "art", "art__x")
    assert(graft.core.PosixCommit.resolvePublished(root, "art") === "art__x")
    // the fixed path reads THROUGH the link — the DuckDB oracle's view
    assert(spark.read.parquet(s"$root/art").count() === 5L)
    graft.core.PosixCommit.publish(root, "art", "art__y")
    assert(spark.read.parquet(s"$root/art").count() === 7L)
  }

  // ---- r14: s19's versioned two-table publish under the sim --------

  test("versioned publish: reader reconciles entirely-v1 or entirely-v2 at every flip crash point") {
    val root = java.nio.file.Files.createTempDirectory("pub_vers")
      .toString + "/store"
    graft.catalog.Relational.publishOneVersion(spark, sfDir, root,
      1, "1996-01-01")
    def assertCoherent(tag: String): Unit = {
      val r = graft.catalog.Relational
        .readPublished(spark, root, new graft.core.ObjectStoreSim())
        .collect()
      assert(r.nonEmpty, s"$tag: reader resolved an empty store")
      assert(r.forall(row => row.getBoolean(3) && row.getBoolean(4)),
        s"$tag: cross-table reconciliation broke — torn version read")
    }
    // steps in one flip commit
    val p0 = new graft.core.ObjectStoreSim()
    graft.catalog.Relational.publishOneVersion(spark, sfDir, root,
      2, "1997-01-01", p0)
    val total = p0.stepsTaken
    assert(total >= 2)
    for (k <- 0 until total) {
      graft.core.PosixCommit.flip(root, "v=1") // reset pointer to old
      try {
        graft.catalog.Relational.publishOneVersion(spark, sfDir, root,
          2, "1997-01-01", new graft.core.ObjectStoreSim(crashAfter = k))
        fail(s"crashAfter=$k did not crash")
      } catch { case _: graft.core.SimulatedCrash => () }
      val v = new graft.core.ObjectStoreSim().current(root)
      assert(v === "v=1" || v === "v=2",
        s"crash point $k: pointer resolved to debris '$v'")
      assertCoherent(s"crash point $k (at $v)")
    }
  }

  // ---- r14: the MOR fold + tombstone retirement crash matrix -------

  /** An object-store MOR reader: LIST the tombstone keys (no dirs on a
    * store — a partially-retired set is just fewer objects), anti-join
    * what remains. */
  private def morRead(store: String, tomb: String): Set[Long] = {
    val files = Option(new java.io.File(tomb)).filter(_.exists())
      .map(d => org.apache.commons.io.FileUtils.listFiles(d,
        Array("parquet"), true).toArray.map(_.toString)).getOrElse(Array.empty)
    val base = spark.read.parquet(store)
    val served = if (files.isEmpty) base
      else base.join(spark.read.parquet(files.toIndexedSeq: _*)
        .select("o_orderkey"), Seq("o_orderkey"), "left_anti")
    served.select("o_orderkey").as[Long].collect().toSet
  }

  test("MOR fold + retirement: reader serves the delete-truth at every crash point") {
    def fresh(): (String, String) = {
      val base = java.nio.file.Files.createTempDirectory("mor_fold").toString
      val store = s"$base/store"; val tomb = s"$base/tomb"
      spark.range(90).toDF("o_orderkey")
        .withColumn("o_month",
          concat(lit("1996-0"), (pmod(col("o_orderkey"), lit(3)) + 1)))
        .write.partitionBy("o_month").parquet(store)
      // month 1996-03 fully deleted (EMPTIES a partition) + mod-9 keys
      // of 1996-01 (partial fold)
      spark.read.parquet(store)
        .filter(col("o_month") === "1996-03" ||
          (col("o_month") === "1996-01" && pmod(col("o_orderkey"), lit(9)) === 0))
        .write.partitionBy("o_month").parquet(tomb)
      (store, tomb)
    }
    val truth = (0L until 90L)
      .filterNot(k => k % 3 == 2 || (k % 3 == 0 && k % 9 == 0)).toSet
    def foldAndRetire(store: String, tomb: String,
                      proto: graft.core.ObjectStoreSim): Unit = {
      val touched = proto.partitions(tomb, "o_month")
      val tombs = spark.read.parquet(tomb).select("o_orderkey")
        .localCheckpoint(true)
      graft.catalog.ScaleOps.morFold(spark, store, touched, tombs,
        proto = proto)
      proto.deleteDir(tomb) // retirement is the LAST step by contract
    }
    val (s0, t0) = fresh()
    val p0 = new graft.core.ObjectStoreSim()
    foldAndRetire(s0, t0, p0)
    assert(morRead(s0, t0) === truth, "un-crashed fold diverged from truth")
    val total = p0.stepsTaken
    assert(total >= 6, s"expected per-object delete steps, saw $total")
    // Each fresh() dataset owns its own crash horizon: the stepped
    // deletes are per-FILE, and how many part files Spark writes per
    // partition varies with task scheduling run-to-run — so walk k
    // upward until a run completes uncrashed instead of assuming p0's
    // step count transfers. Every prefix crash point must leave the
    // reader on the delete-truth; the completed run must too.
    var k = 0
    var completed = false
    while (!completed && k <= 2 * total + 16) {
      val (store, tomb) = fresh()
      try {
        foldAndRetire(store, tomb, new graft.core.ObjectStoreSim(crashAfter = k))
        completed = true
      } catch { case _: graft.core.SimulatedCrash => () }
      assert(morRead(store, tomb) === truth,
        s"crash point $k: MOR reader served a torn state")
      k += 1
    }
    assert(completed, s"no run completed within ${2 * total + 16} crash points")
    assert(k - 1 >= 6, s"crash matrix covered only ${k - 1} points")
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
