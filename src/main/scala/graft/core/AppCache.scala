package graft.core

import java.util.concurrent.ConcurrentHashMap

/** Shared discipline for the session-scoped memo caches: every value is
  * (or holds) a localCheckpoint-backed frame, so keys lead with
  * `sparkContext.applicationId` — a fresh context in the same JVM must
  * never see a dead context's checkpoint blocks. `get` additionally
  * evicts entries from dead contexts on the way in: only one context is
  * live per JVM at a time, so any entry keyed by a different
  * applicationId is unreachable garbage (a long-lived JVM cycling
  * SparkContexts — test harnesses — would otherwise accumulate plans
  * referencing dead blocks indefinitely).
  */
object AppCache {
  // Every cache that ever flows through `get` self-registers here, so
  // the serialization-hygiene audit can enumerate ALL memoized values
  // (not just the ones a spec author remembered) and prove none pins a
  // session — the round-9 Observation/trainingSummary bug class.
  private val registry =
    ConcurrentHashMap.newKeySet[ConcurrentHashMap[_, _]]()

  /** `key` must lead with the current applicationId. */
  def get[K <: Product, V](cache: ConcurrentHashMap[K, V], key: K)(mk: => V): V = {
    registry.add(cache)
    val app = key.productElement(0)
    cache.keySet.removeIf(k => k.productElement(0) != app)
    cache.computeIfAbsent(key, _ => mk)
  }

  /** Audit surface: a snapshot of every value currently memoized in any
    * registered cache. */
  def allCachedValues: Seq[Any] = {
    import scala.jdk.CollectionConverters._
    registry.asScala.toSeq.flatMap(_.values.asScala.toSeq)
  }
}
