package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The persisted-artifact plumbing shared by the catalog's
  * deterministic-twin entries (m1b/m11b/m12b/m3b/m10, sim_ivf_persisted):
  * a twin persists model-coupled bits under the per-SF artifact root and
  * BOTH engines recompute the gated math from the same parquet. One
  * definition of the path scheme keeps the engine's writes and the
  * oracle's reads from ever diverging.
  */
object Artifacts {
  private def root(dir: String) =
    s"/tmp/graft_artifacts/${new java.io.File(dir).getName}"

  /** THE path-tag for keying /tmp staging roots by an input string
    * (usually the SF dir): one definition, because a spec that resolves
    * the same path as its entry must agree bit-for-bit, and the scheme
    * had been hand-rolled at 7+ sites. */
  def dirTag(s: String): String =
    java.lang.Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(s))

  /** Persist `df` under the per-SF artifact root and read it back, so
    * downstream plans consume the exact persisted bits.
    *
    * Concurrency contract (r13): the build lands in an APP-PRIVATE dir
    * (`<name>__<appTag>`) that this app's readers consume directly —
    * immune to a concurrent same-SF app's rebuild — and the fixed
    * reader path `<root>/<name>` is a NAMED POINTER published onto the
    * newest completed build through [[CommitProtocol.publish]] (r14):
    * POSIX realizes it as the atomically-swapped symlink the DuckDB
    * oracle reads through; an object store realizes it as a
    * pointer-object PUT that readers resolve — the seam owns the
    * primitive, `ObjectStoreSim` crash-proves it. Every artifact is a
    * deterministic function of the SF dir by design — the hash gate
    * requires it — so whichever app's build a reader resolves, the
    * VALUES match. Dead apps' builds reap age-gated. */
  def write(spark: SparkSession, dir: String, name: String, df: DataFrame,
            proto: CommitProtocol = PosixCommit): DataFrame = {
    val appTag = dirTag(spark.sparkContext.applicationId)
    val mine = s"${name}__$appTag"
    val path = s"${root(dir)}/$mine"
    df.write.mode("overwrite").parquet(path)
    proto.publish(root(dir), name, mine)
    reapStaleWhere(root(dir),
      n => n.startsWith(s"${name}__") && n != mine)
    spark.read.parquet(path)
  }

  /** DuckDB-side read of the same artifact — the correctness gate runs
    * at sf0.01, so the oracles read that root. */
  def sql(name: String): String =
    s"read_parquet('/tmp/graft_artifacts/sf0.01/$name/*.parquet')"

  /** Reap sibling staging dirs with `prefix` under `parent` that are not
    * `keep` and have been untouched for `maxAgeMs`. Age-gating is what
    * makes this safe across PROCESSES (unlike the in-JVM AppCache rule):
    * a live concurrent run's dir is freshly modified and never hit,
    * while dead runs' leftovers stop accumulating on long-lived boxes. */
  def reapStale(parent: String, prefix: String, keep: String,
                maxAgeMs: Long = 6L * 3600 * 1000): Unit =
    reapStaleWhere(parent,
      name => name.startsWith(prefix), keepPath = keep, maxAgeMs = maxAgeMs)

  /** Predicate form of `reapStale` for callers whose "mine vs theirs"
    * rule is not a plain prefix (e.g. app-tagged warehouse tables). The
    * age gate is still what makes it cross-process-safe. */
  def reapStaleWhere(parent: String, stale: String => Boolean,
                     keepPath: String = "",
                     maxAgeMs: Long = 6L * 3600 * 1000): Unit = {
    val cutoff = System.currentTimeMillis() - maxAgeMs
    Option(new java.io.File(parent).listFiles()).getOrElse(Array.empty)
      .filter(f => stale(f.getName) && f.getPath != keepPath &&
        f.lastModified() < cutoff)
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
  }
}
