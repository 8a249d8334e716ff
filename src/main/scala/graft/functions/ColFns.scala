package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Column-level scalar functions (SURVEY §2.7 F1–F15), built exclusively
  * from codegen'd `org.apache.spark.sql.functions` so they stay inside
  * whole-stage codegen — no UDFs anywhere in the hot path.
  *
  * Reference behaviors re-expressed (citations into /root/reference/):
  *  - name normalization: First_Data_injection.py:37,59,88
  *  - multi-format date parse: second_third_and_forth_data_injection.py:24-37
  *  - sigmoid/logit/softmax column math:
  *    topk_recommandations_diverse_nodiscounts.py:266-269
  */
object ColFns {

  /** Single-partition WindowSpec with the bound made EXPLICIT: partitions
    * by a non-foldable always-zero key derived from `key` (a foldable
    * literal would be optimizer-stripped back to the empty spec, which is
    * a silent single-partition WindowExec). Semantically identical to
    * `Window.orderBy(order…)` — use ONLY where the input frame is bounded
    * by construction (histograms over distinct values, fit trajectories,
    * post-limit survivors, quantized score tables), so "every row in one
    * partition" is the operator's stated contract rather than an accident
    * the executor has to warn about. */
  def boundedGlobal(key: Column)(order: Column*): WindowSpec =
    // coalesce: a null key must not mint a second (null-keyed) partition
    // and silently split the frame the caller declared single-partition
    Window.partitionBy(coalesce(pmod(xxhash64(key), lit(1)), lit(0L)))
      .orderBy(order: _*)

  /** Orderless sibling of [[boundedGlobal]] for whole-frame aggregates
    * (share-of-total over a grouped result): same explicit-bound
    * contract, no ordering — the frame is the entire (bounded)
    * partition. A bare `Window.partitionBy()` computes the same thing
    * but reads as an accident and logs the executor's no-partition
    * warning; this spells the bound out in the plan. */
  def boundedGlobalAgg(key: Column): WindowSpec =
    Window.partitionBy(coalesce(pmod(xxhash64(key), lit(1)), lit(0L)))

  /** F1: snake_case a column *name* the way the reference normalizes CSV
    * headers (strip, replace "-"/" " with "_", lowercase). */
  def normalizeName(name: String): String =
    name.trim.replace("-", "_").replace(" ", "_").toLowerCase

  /** F1 applied to values: trim + lower. */
  def normValue(c: Column): Column = lower(trim(c))

  /** F5/F6: multi-format timestamp parse with a default on total failure.
    * Mirrors safe_date_parse's fallback chain; `try_to_timestamp` yields
    * null per format, coalesce walks the chain. */
  def multiFormatTs(c: Column, formats: Seq[String], default: Column): Column = {
    val attempts = formats.map(f => try_to_timestamp(c, lit(f)))
    coalesce(attempts :+ default: _*)
  }

  /** F9: z-score guarded against zero stddev (DuckDB nulls x/0; Spark
    * yields Infinity — both engines must agree, so we pin 0.0). */
  def safeZScore(x: Column, mean: Column, std: Column): Column =
    when(std.isNull || std === 0.0, 0.0).otherwise((x - mean) / std)

  /** F13: numerically-stable-enough sigmoid for score columns in (0,1). */
  def sigmoid(x: Column): Column = lit(1.0) / (lit(1.0) + exp(-x))

  /** F13: logit with clipping, as the softmax recommenders do. */
  def logit(p: Column, eps: Double = 1e-6): Column = {
    val q = least(greatest(p, lit(eps)), lit(1.0 - eps))
    log(q / (lit(1.0) - q))
  }

  /** Deterministic pseudo-uniform in [0,1) from integer key columns.
    *
    * Replaces `rand(seed)` everywhere a result must be reproducible
    * across partitionings AND replayable by the DuckDB oracle (SURVEY
    * §7.4 trap 9): pure integer arithmetic, identical in any engine.
    * At 100 TB this also removes the partition-order dependence of
    * `rand`, making every sampling operator retry/AQE-safe.
    */
  def pseudoUniform(key: Column, salt: Long): Column =
    pmod(pmod(key, lit(999983L)) * lit(2654435761L) + lit(salt) * lit(40503L), lit(1000003L))
      .cast("double") / lit(1000003.0)

  /** The same pseudo-uniform, as a DuckDB SQL fragment (oracle mirror).
    * The inner mod keeps the product < 2^63 for any int64 key (Spark 4
    * ANSI mode would raise on overflow; DuckDB likewise errors). The
    * double-% handles DuckDB's sign-of-dividend modulo for negative keys.
    */
  def pseudoUniformSql(keyExpr: String, salt: Long): String = {
    // CAST to DOUBLE before dividing: DuckDB would otherwise perform
    // DECIMAL division (int / 1000003.0), whose rounding differs from
    // Spark's IEEE double division.
    val reduced = s"((($keyExpr) % 999983 + 999983) % 999983)"
    val mixed   = s"(($reduced * 2654435761 + $salt * 40503) % 1000003 + 1000003) % 1000003"
    s"(CAST($mixed AS DOUBLE) / CAST(1000003 AS DOUBLE))"
  }

  /** Round for cross-engine float comparison of aggregate outputs. */
  def round6(c: Column): Column = round(c, 6)
}
