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

  // r14: LRU bookkeeping for the budget trim (SCALING sf10 addendum
  // #3: 260 entries' app-lifetime checkpoint memos BECAME the heap at
  // sf10 — GC thrash, g3 ~8× — because nothing ever evicted them).
  private val tick = new java.util.concurrent.atomic.AtomicLong()
  private val lastTouch =
    new ConcurrentHashMap[(ConcurrentHashMap[_, _], Any), java.lang.Long]()

  /** `key` must lead with the current applicationId. */
  def get[K <: Product, V](cache: ConcurrentHashMap[K, V], key: K)(mk: => V): V = {
    registry.add(cache)
    val app = key.productElement(0)
    cache.keySet.removeIf(k => k.productElement(0) != app)
    lastTouch.put((cache, key), tick.incrementAndGet())
    cache.computeIfAbsent(key, _ => mk)
  }

  /** Audit surface: a snapshot of every value currently memoized in any
    * registered cache. */
  def allCachedValues: Seq[Any] = {
    import scala.jdk.CollectionConverters._
    registry.asScala.toSeq.flatMap(_.values.asScala.toSeq)
  }

  private def framesOf(v: Any): Seq[org.apache.spark.sql.DataFrame] =
    v match {
      case ds: org.apache.spark.sql.Dataset[_] => Seq(ds.toDF())
      case p: Product => p.productIterator.collect {
        case ds: org.apache.spark.sql.Dataset[_] => ds.toDF()
      }.toSeq
      case _ => Seq.empty
    }

  /** Budget-aware LRU eviction of the checkpoint-backed memo values —
    * called at ENTRY BOUNDARIES (Bench/Verify, between queries: the
    * one point where no in-flight plan can still hold an evicted
    * frame). Accounts only memory-RESIDENT block bytes (disk-spilled
    * checkpoint blocks don't pressure the heap); while the total
    * exceeds `budgetBytes`, least-recently-touched entries are dropped
    * from their maps and their checkpoint RDDs unpersisted — refcounted
    * across entries first, because two memos may legitimately share
    * one checkpointed frame and a shared RDD must outlive its last
    * reference (a localCheckpoint cannot recompute). A re-request
    * simply rebuilds: correctness is untouched, the memo just stops
    * being app-lifetime once it stops fitting. Returns
    * (entriesEvicted, bytesReleased). */
  def trimToBudget(spark: org.apache.spark.sql.SparkSession,
                   budgetBytes: Long): (Int, Long) = {
    import scala.jdk.CollectionConverters._
    val memBytes = spark.sparkContext.getRDDStorageInfo
      .map(i => i.id -> i.memSize).toMap
    final case class Ent(cache: ConcurrentHashMap[_, _], key: Any,
                         rdds: Seq[Int], bytes: Long, touch: Long)
    val ents = registry.asScala.toSeq.flatMap { c =>
      c.entrySet.asScala.toSeq.map { e =>
        val rdds = framesOf(e.getValue)
          .flatMap(org.apache.spark.sql.GraftColumnBridge.checkpointRddId)
          .distinct
        Ent(c, e.getKey, rdds, rdds.map(memBytes.getOrElse(_, 0L)).sum,
          Option(lastTouch.get((c, e.getKey))).map(_.longValue).getOrElse(0L))
      }
    }
    // refcount each RDD across ALL entries (evicted or not): release
    // only when the last referencing entry goes
    val refs = scala.collection.mutable.Map.empty[Int, Int]
    ents.foreach(_.rdds.foreach(id => refs(id) = refs.getOrElse(id, 0) + 1))
    // total over DISTINCT rdds (two entries may share one frame)
    var total = refs.keys.map(memBytes.getOrElse(_, 0L)).sum
    var freed = 0L; var n = 0
    val sc = spark.sparkContext
    for (e <- ents.sortBy(_.touch) if total > budgetBytes && e.bytes > 0) {
      e.cache.asInstanceOf[ConcurrentHashMap[Any, Any]].remove(e.key)
      lastTouch.remove((e.cache, e.key))
      e.rdds.foreach { id =>
        refs(id) -= 1
        if (refs(id) == 0) {
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
          val b = memBytes.getOrElse(id, 0L)
          freed += b; total -= b
        }
      }
      n += 1
    }
    (n, freed)
  }
}
