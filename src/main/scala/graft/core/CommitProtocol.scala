package graft.core

/** THE filesystem seam under the lakehouse entries' commit steps —
  * naming the two primitives s19/s20/s21 (pointer flip) and s22/e21
  * (partition-dir enumeration) need from storage, so the 100 TB story
  * has no undocumented POSIX assumption:
  *
  *  - `flip` publishes a new pointer value such that a concurrent
  *    reader observes the OLD value or the NEW value, never a partial
  *    or mixed one. POSIX: stage + `ATOMIC_MOVE` rename. Object store
  *    (S3/GCS, which have NO atomic rename): one whole-object PUT of
  *    the small pointer object — atomic and strongly consistent per
  *    object on both stores — guarded in production by a generation
  *    precondition (S3 conditional PUT If-Match / GCS
  *    ifGenerationMatch) or a catalog-held pointer (what Iceberg/Delta
  *    do), which adds lost-update protection the single-writer entries
  *    here don't need.
  *  - `partitions` enumerates a store's partition dirs. POSIX: one
  *    directory listing. Object store: one LIST page per ~1000 keys —
  *    fine at the metadata scale these entries use it (the tombstone
  *    store's touched months), while a CORPUS-sized store's file set
  *    is owned by a manifest instead (s20), which is exactly why the
  *    s20 readers never list at all.
  *
  * Everything else the entries do to storage is already object-store
  * clean: parquet writes go through Spark's committer, version/data
  * dirs are written unreferenced before any pointer names them, and
  * deletes are per-key object deletes. `CommitProtocolSpec` proves the
  * reader-invisibility claims survive rename-as-copy+delete at every
  * crash point via [[ObjectStoreSim]].
  */
trait CommitProtocol {
  /** Publish `value` as `root`'s current pointer (the `_CURRENT`
    * object). Contract: all-or-nothing under concurrent reads. */
  def flip(root: String, value: String): Unit

  /** Resolve the current pointer. */
  def current(root: String): String = java.nio.file.Files.readString(
    java.nio.file.Paths.get(s"$root/_CURRENT")).trim

  /** The partition-dir names of `store` with hive prefix `col=` —
    * metadata-scale enumeration (values only, no data files). */
  def partitions(store: String, col: String): Seq[String] =
    Option(new java.io.File(store).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(s"$col="))
      .map(_.getName.stripPrefix(s"$col=")).toSeq.sorted
}

/** The sandbox implementation: stage the pointer content next to its
  * destination, then one `ATOMIC_MOVE` rename — the strongest
  * primitive POSIX offers, and the one object stores lack. */
object PosixCommit extends CommitProtocol {
  def flip(root: String, value: String): Unit = {
    val staged = java.nio.file.Paths.get(s"$root/_CURRENT.staged")
    java.nio.file.Files.writeString(staged, value)
    java.nio.file.Files.move(staged,
      java.nio.file.Paths.get(s"$root/_CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}

/** Object-store semantics on the local filesystem, for the portability
  * proof: there is NO rename, so the naive port of the POSIX flip is
  * COPY (a whole-object PUT of the destination) + DELETE (of the
  * staged object) — two individually-durable steps with no atomicity
  * across the pair. Each primitive op is one indivisible `step()` (an
  * object PUT/DELETE either lands completely or not at all — the
  * S3/GCS per-object contract; partial objects are not observable),
  * and the harness crashes the protocol BETWEEN steps via
  * `crashAfter`, so a spec can enumerate every crash point of a
  * multi-step commit and assert what a concurrent reader resolves. */
final class SimulatedCrash(at: String)
  extends RuntimeException(s"simulated crash before step: $at")

final class ObjectStoreSim(crashAfter: Int = Int.MaxValue)
    extends CommitProtocol {
  private var steps = 0
  /** One indivisible object-store operation. */
  def step[A](label: String)(op: => A): A = {
    if (steps >= crashAfter) throw new SimulatedCrash(label)
    val r = op; steps += 1; r
  }
  def stepsTaken: Int = steps
  def flip(root: String, value: String): Unit = {
    val staged = java.nio.file.Paths.get(s"$root/_CURRENT.staged")
    step(s"put $staged")(java.nio.file.Files.writeString(staged, value))
    // "rename" leg 1 — COPY: one whole-object PUT of the destination
    step(s"put $root/_CURRENT")(java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/_CURRENT"), value))
    // "rename" leg 2 — DELETE the staged object; a crash between the
    // legs leaves debris no manifest-scoped reader ever lists
    step(s"delete $staged")(java.nio.file.Files.deleteIfExists(staged))
  }
  /** An object-store partition-dir delete is per-key object deletes —
    * individually durable, no atomicity across a dir. Modeled one
    * step per data file, so crash points land MID-partition too. */
  def deleteDir(path: String): Unit = {
    val d = new java.io.File(path)
    Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
      step(s"delete $f")(org.apache.commons.io.FileUtils.deleteQuietly(f))
    }
    step(s"delete $path")(org.apache.commons.io.FileUtils.deleteQuietly(d))
  }
}
