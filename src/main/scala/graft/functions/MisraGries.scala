package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitters summary as a typed [[Aggregator]] — the
  * deterministic frequent-items sketch (k counters, no randomness).
  *
  * Guarantee (Misra & Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): after any sequence of reduces and
  * merges over n items, every item with true count > n/(k+1) is present
  * in the summary, and every estimate undercounts its true count by at
  * most n/(k+1). Both properties hold under Spark's partial+final
  * aggregation because the merge (sum counters, then subtract the
  * (k+1)-th largest count from all) preserves the error bound — so the
  * sketch is safe at any partitioning, which is what makes it usable on
  * a 10^12-token corpus where exact per-token counts would be a huge
  * shuffle: the summary is k entries per partition, period.
  */
object MisraGries {

  /** mg(item, k): use as df.agg(MisraGries(col("t"), 30)) → map<item,est>. */
  def apply(item: Column, k: Int): Column = udaf(new Agg(k)).apply(item)

  private final class Agg(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0, "k must be positive")
    def zero: Map[String, Long] = Map.empty
    def reduce(m: Map[String, Long], t: String): Map[String, Long] =
      m.get(t) match {
        case Some(c) => m.updated(t, c + 1)
        case None if m.size < k => m.updated(t, 1L)
        // full and unseen: decrement every counter, drop zeros (the
        // arriving item is absorbed by the shared decrement)
        case None => m.collect { case (x, c) if c > 1 => x -> (c - 1) }
      }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        sum.collect { case (t, c) if c > cut => t -> (c - cut) }
      }
    }
    def finish(m: Map[String, Long]): Map[String, Long] = m
    def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }
}
