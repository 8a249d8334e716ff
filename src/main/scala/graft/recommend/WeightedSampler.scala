package graft.recommend

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed weighted sampling without replacement with per-category caps —
  * the residual custom-UDAF surface from SURVEY §2.13 (the reference's
  * rejection loop, topk_recommandations_diverse_nodiscounts.py:279-296).
  *
  * Implemented as an `Aggregator[Candidate, Buffer, Seq[Pick]]` using
  * the weighted-reservoir (Efraimidis–Spirakis) key: k = u^(1/w) with a
  * deterministic per-candidate uniform — the same exponential-race
  * construction as the walk engine, so results are independent of row
  * order and partitioning. Keeping the top-n keys under a category cap
  * is an associative, commutative merge — a real distributed aggregate,
  * not a driver loop.
  */
object WeightedSampler {

  final case class Candidate(customer: Long, product: Long, category: String,
                             weight: Double, u: Double)
  final case class Pick(product: Long, category: String, key: Double)
  final case class Buffer(picks: List[Pick])

  /** Efraimidis–Spirakis key; higher is better. */
  private def esKey(c: Candidate): Double =
    math.pow(math.max(c.u, 1e-12), 1.0 / math.max(c.weight, 1e-12))

  class TopKWeighted(n: Int, categoryCap: Int)
      extends Aggregator[Candidate, Buffer, Seq[Pick]] {

    private def insert(buf: List[Pick], p: Pick): List[Pick] = {
      val merged = (p :: buf).sortBy(x => (-x.key, x.product))
      // enforce the per-category cap first, then the global n
      val capped = merged.foldLeft((List.empty[Pick], Map.empty[String, Int])) {
        case ((acc, counts), pick) =>
          val c = counts.getOrElse(pick.category, 0)
          if (c < categoryCap) (pick :: acc, counts.updated(pick.category, c + 1))
          else (acc, counts)
      }._1.reverse
      capped.take(n)
    }

    override def zero: Buffer = Buffer(Nil)
    override def reduce(b: Buffer, c: Candidate): Buffer =
      Buffer(insert(b.picks, Pick(c.product, c.category, esKey(c))))
    override def merge(a: Buffer, b: Buffer): Buffer =
      Buffer(b.picks.foldLeft(a.picks)(insert))
    override def finish(b: Buffer): Seq[Pick] = b.picks
    override def bufferEncoder: Encoder[Buffer] = Encoders.product[Buffer]
    override def outputEncoder: Encoder[Seq[Pick]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pick]]()
  }

  /** Group candidates by customer and draw n weighted picks each. */
  def sample(cands: Dataset[Candidate], n: Int, categoryCap: Int)
      : Dataset[(Long, Seq[Pick])] = {
    import cands.sparkSession.implicits._
    cands.groupByKey(_.customer)
      .agg(new TopKWeighted(n, categoryCap).toColumn.name("picks"))
  }
}
