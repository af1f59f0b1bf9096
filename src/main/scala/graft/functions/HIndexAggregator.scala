package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** h-index as a typed [[Aggregator]] — the custom-UDAF formulation of
  * SURVEY §2.4 A6 (reference: binary search over desc-sorted citations,
  * `dags/scripts/augmentations.py:125-148`).
  *
  * The buffer is a fixed-size histogram of citation counts clamped at
  * `Cap`: h-index never exceeds the paper count, and papers with more than
  * `Cap` citations contribute exactly like `Cap`-cited ones once h <= Cap.
  * That makes the buffer O(1) (Cap+1 ints), merge commutative/associative
  * (map-side combine friendly), and the finish pass a single descending
  * scan — no per-group sort, no unbounded state, unlike a naive
  * collect-and-sort UDAF. Usable when the window formulation
  * ([[GroupOps.hIndex]], the default) is awkward, e.g. inside a single
  * multi-aggregate `agg(...)` pass.
  *
  * Cap = 1000 keeps the serialized buffer at 4 KB per group in the
  * partial-aggregate shuffle while staying exact for any h-index <= 1000
  * (exceeding that requires 1000+ papers with 1000+ citations each). */
object HIndexAggregator {

  val Cap = 1000

  private object Agg extends Aggregator[Int, Array[Int], Int] {
    def zero: Array[Int] = new Array[Int](Cap + 1)
    def reduce(b: Array[Int], cites: Int): Array[Int] = {
      val c = math.max(0, math.min(cites, Cap))
      b(c) += 1
      b
    }
    def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i <= Cap) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Int]): Int = {
      // descending scan: papers with >= c citations, first c where count >= c
      var atLeast = 0
      var c = Cap
      while (c >= 1) {
        atLeast += b(c)
        if (atLeast >= c) return c
        c -= 1
      }
      0
    }
    // native array encoder (unsafe array, ~4 KB) instead of Java
    // serialization — smaller and faster in the partial-agg shuffle
    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    def outputEncoder: Encoder[Int] = Encoders.scalaInt
  }

  /** hindex(citations): df.groupBy(author).agg(HIndexAggregator(col)). */
  def apply(cites: Column): Column = udaf(Agg).apply(cites)
}
