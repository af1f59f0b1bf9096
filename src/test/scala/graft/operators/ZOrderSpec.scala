package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def refMorton(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = xs.size
    for ((x, ci) <- xs.zipWithIndex; i <- 0 until bits)
      z |= ((x >> i) & 1L) << (i * n + ci)
    z
  }

  test("zKey matches a JVM reference interleave, any column count") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 500).map(_ =>
      (rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 10).toLong))
    val got2 = rows.toDF("x", "y", "w")
      .select(ZOrder.zKey(Seq(col("x"), col("y")), 16).as("z"))
      .as[Long].collect().toSeq
    assert(got2 == rows.map(r => refMorton(Seq(r._1, r._2), 16)))
    val got3 = rows.toDF("x", "y", "w")
      .select(ZOrder.zKey(Seq(col("x"), col("y"), col("w")), 10).as("z"))
      .as[Long].collect().toSeq
    assert(got3 == rows.map(r => refMorton(Seq(r._1 & 1023, r._2 & 1023, r._3), 10)))
  }

  test("z-order layout prunes a non-leading-dimension box query; x-sort cannot") {
    // 64x64 grid of points; the query is a thin band on y (the dimension a
    // linear x-sorted layout carries no order for)
    val pts = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    def boxesHit(laidOut: org.apache.spark.sql.DataFrame): Long = {
      // per output partition: the min/max stats a parquet footer would
      // carry; count partitions whose y-range intersects the band
      laidOut.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg(min("y").as("ymin"), max("y").as("ymax"))
        .filter(col("ymin") <= 11 && col("ymax") >= 8) // band y in [8, 11]
        .count()
    }
    val parts = 16
    val zHit = boxesHit(ZOrder.layoutByZOrder(pts, Seq(col("x"), col("y")), parts, bits = 6))
    val xHit = boxesHit(pts.repartitionByRange(parts, col("x")).sortWithinPartitions("x"))
    assert(xHit == parts.toLong, s"x-sorted layout should prune nothing, hit $xHit")
    assert(zHit <= parts / 2, s"z-order should skip most files, hit $zHit of $parts")
    // and the layout is a pure reordering — no rows gained or lost
    assert(ZOrder.layoutByZOrder(pts, Seq(col("x"), col("y")), parts, bits = 6).count() == 64L * 64L)
  }

  test("zKey masks values wider than `bits` instead of corrupting neighbors") {
    val df = Seq((65536L + 3L, 1L)).toDF("x", "y") // x overflows 16 bits
    val z = df.select(ZOrder.zKey(Seq(col("x"), col("y")), 16).as("z")).as[Long].head()
    assert(z == refMorton(Seq(3L, 1L), 16))
  }
}
