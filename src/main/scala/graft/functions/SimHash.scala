package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** 64-bit SimHash as a typed [[Aggregator]] (the custom-UDAF exemplar from
  * SURVEY.md §2.11): input = 64-bit token hashes, buffer = 64 signed bit
  * counters, output = the sign vector packed into a Long.
  *
  * Near-duplicate docs (high token overlap) land within a small Hamming
  * distance; candidate generation at scale uses the pigeonhole chunking in
  * [[graft.operators.Dedup.simhashPairs]]. The aggregation is associative/
  * commutative, so Spark runs it partial+final (map-side combine) like any
  * built-in agg — no per-group data motion beyond the 64-int buffer.
  */
object SimHash {

  val Bits = 64

  private object Agg extends Aggregator[Long, Array[Int], Long] {
    def zero: Array[Int] = new Array[Int](Bits)
    def reduce(b: Array[Int], h: Long): Array[Int] = {
      var i = 0
      while (i < Bits) {
        if (((h >>> i) & 1L) == 1L) b(i) += 1 else b(i) -= 1
        i += 1
      }
      b
    }
    def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < Bits) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Int]): Long = {
      var r = 0L
      var i = 0
      while (i < Bits) { if (b(i) > 0) r |= (1L << i); i += 1 }
      r
    }
    // native array encoder: the 64-int buffer serializes as an unsafe
    // array (~260 B) in every partial-agg shuffle row — Java serialization
    // of the same buffer is several × larger and slower to round-trip
    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** simhash(tokenHash): use as df.groupBy(id).agg(SimHash(col("h"))). */
  def apply(tokenHash: Column): Column = udaf(Agg).apply(tokenHash)
}
