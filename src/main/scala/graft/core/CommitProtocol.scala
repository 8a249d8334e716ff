package graft.core

/** THE filesystem seam under the lakehouse entries' commit steps —
  * naming every primitive the catalog needs from storage, so the
  * 100 TB story has no undocumented POSIX assumption: `flip` (s19/s20/
  * s21's `_CURRENT` pointer), `publish`/`resolvePublished` (the
  * artifact registry's named pointers, r14 — previously a raw symlink
  * swap outside the seam), `partitions` (s22/e21/s23's metadata-scale
  * enumeration), and `deleteDir` (vacuum / emptied-partition /
  * tombstone-retirement reclamation):
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

  /** Publish sibling dir `target` as NAMED pointer `rootDir/name` —
    * the artifact-registry shape (many named artifacts under one root,
    * each with its own pointer), vs `flip`'s one-`_CURRENT`-per-store.
    * Same all-or-nothing contract. POSIX: a staged symlink +
    * `ATOMIC_MOVE` — the symlink doubles as a PATH, so fixed-path
    * readers that can't resolve pointers themselves (the DuckDB oracle)
    * read through it transparently. Object store: one whole-object PUT
    * of a pointer object whose content is the target dir name; readers
    * there MUST resolve via [[resolvePublished]] (S3/GCS have no
    * symlinks — transparent-path reading is a POSIX privilege, which is
    * exactly why this is a seam primitive and not an `Artifacts`
    * detail). */
  def publish(rootDir: String, name: String, target: String): Unit

  /** Resolve named pointer `rootDir/name` to its current target dir
    * name (sibling under `rootDir`). */
  def resolvePublished(rootDir: String, name: String): String

  /** The partition-dir names of `store` with hive prefix `col=` —
    * metadata-scale enumeration (values only, no data files). */
  def partitions(store: String, col: String): Seq[String] =
    Option(new java.io.File(store).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(s"$col="))
      .map(_.getName.stripPrefix(s"$col=")).toSeq.sorted

  /** Remove a partition/staging dir tree. POSIX: one recursive delete.
    * Object store: per-key object deletes with NO atomicity across the
    * dir — which is why every caller orders its deletes so a reader is
    * correct at any intermediate state (s20: only after no manifest
    * references the dir; MOR fold: store deletes complete before
    * tombstone retirement begins, so the anti-join masks stale rows). */
  def deleteDir(path: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
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

  /** Named-pointer publish as a SYMLINK flip: stage the link, one
    * `ATOMIC_MOVE` onto `rootDir/name`. A real directory left at the
    * pointer path by the pre-r13 artifact scheme is removed once. */
  def publish(rootDir: String, name: String, target: String): Unit = {
    val link = java.nio.file.Paths.get(s"$rootDir/$name")
    if (java.nio.file.Files.exists(link,
        java.nio.file.LinkOption.NOFOLLOW_LINKS) &&
        !java.nio.file.Files.isSymbolicLink(link))
      org.apache.commons.io.FileUtils.deleteQuietly(link.toFile)
    val tmp = java.nio.file.Paths.get(s"$rootDir/.lnk_$target")
    java.nio.file.Files.deleteIfExists(tmp)
    java.nio.file.Files.createSymbolicLink(tmp,
      java.nio.file.Paths.get(target))
    java.nio.file.Files.move(tmp, link,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def resolvePublished(rootDir: String, name: String): String =
    java.nio.file.Files.readSymbolicLink(
      java.nio.file.Paths.get(s"$rootDir/$name")).toString
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
  /** Named-pointer publish, naive port like `flip`: the pointer at
    * `rootDir/name` is a small OBJECT whose content is the target dir
    * name (no symlinks on S3/GCS), staged + copied + staged-delete —
    * three individually-durable steps. Readers resolve only
    * `rootDir/name`, never the `.lnk_` debris, so every crash point
    * leaves them on the complete old or complete new build. */
  def publish(rootDir: String, name: String, target: String): Unit = {
    val staged = java.nio.file.Paths.get(s"$rootDir/.lnk_$target")
    step(s"put $staged")(java.nio.file.Files.writeString(staged, target))
    step(s"put $rootDir/$name")(java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$rootDir/$name"), target))
    step(s"delete $staged")(java.nio.file.Files.deleteIfExists(staged))
  }

  def resolvePublished(rootDir: String, name: String): String =
    java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$rootDir/$name")).trim

  /** An object-store partition-dir delete is per-key object deletes —
    * individually durable, no atomicity across a dir (or across nested
    * hive dirs: the recursion makes a partitioned tombstone store's
    * retirement crash MID-subdir too). Modeled one step per data
    * file. */
  override def deleteDir(path: String): Unit = {
    val d = new java.io.File(path)
    Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.isDirectory) deleteDir(f.getPath)
      else step(s"delete $f")(
        org.apache.commons.io.FileUtils.deleteQuietly(f))
    }
    step(s"delete $path")(org.apache.commons.io.FileUtils.deleteQuietly(d))
  }
}
