package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{VectorFunctions => V}

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot and cosine match hand computation in double precision") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val row = df.select(
      V.dot(col("a"), col("b")).as("d"),
      V.cosine(col("a"), col("a")).as("self")).head()
    assert(row.getDouble(0) == 32.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
  }

  test("hyperplanes are deterministic for a fixed seed") {
    val a = V.hyperplanes(4, 8)
    val b = V.hyperplanes(4, 8)
    assert(a.flatten.toSeq == b.flatten.toSeq)
  }

  test("lshBucket separates orthogonal vectors, groups identical ones") {
    val planes = V.hyperplanes(8, 3)
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.001f, 0.0f)),
      (2L, Array(-1.0f, 0.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val buckets = df.select(V.lshBucket(col("embedding"), planes)).as[Int].collect()
    assert(buckets(0) == buckets(1))
    assert(buckets(0) != buckets(2))
  }
}
