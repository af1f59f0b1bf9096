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

  test("int8 quantize/dequantize bounds the error by scale/2 per component") {
    val df = Seq(
      (0L, Array(3.0f, -1.5f, 0.25f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // all-zero: no NaN, quantizes to zeros
    ).toDF("vec_id", "embedding")
    val got = df
      .select(col("vec_id"), col("embedding"), V.quantScale(col("embedding")).as("s"))
      .withColumn("q", V.quantize(col("embedding"), col("s")))
      .withColumn("back", V.dequantize(col("q"), col("s")))
      .select(col("vec_id"), col("s"), col("q"), col("back"))
      .as[(Long, Double, Seq[Int], Seq[Double])].collect()
      .map(r => r._1 -> r).toMap
    val (_, s0, q0, back0) = got(0L)
    assert(q0.forall(q => q >= -127 && q <= 127))
    assert(q0.head == 127) // max element pins the scale
    back0.zip(Seq(3.0, -1.5, 0.25, 0.0)).foreach { case (b, x) =>
      assert(math.abs(b - x) <= s0 / 2 + 1e-12, s"error ${math.abs(b - x)} > ${s0 / 2}")
    }
    val (_, _, q1, back1) = got(1L)
    assert(q1.forall(_ == 0) && back1.forall(_ == 0.0))
  }

  test("codegen dot is bit-identical to the higher-order fold on random vectors") {
    // the HOF formulation DotProductExpr replaced — any drift here would
    // silently invalidate every cosine-based oracle hash
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val d = 1 + rnd.nextInt(96)
      (i.toLong, Array.fill(d)((rnd.nextGaussian() * 10).toFloat),
        Array.fill(d)((rnd.nextGaussian() * 10).toFloat))
    }
    val df = rows.toDF("id", "a", "b")
    val diff = df.select(
      V.dot(col("a"), col("b")).as("fast"), hofDot(col("a"), col("b")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0, "codegen dot must be bit-identical to the HOF fold")
    // float × double-literal side (the lshBucket shape) stays exact too
    val plane = Seq.fill(16)(if (rnd.nextBoolean()) 1.0 else -1.0)
    val df2 = rows.filter(_._2.length >= 16)
      .map(r => (r._1, r._2.take(16))).toDF("id", "a")
    val diff2 = df2.select(
      V.dot(col("a"), typedLit(plane)).as("fast"),
      hofDot(col("a"), typedLit(plane)).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff2 == 0)
  }

  // Parity with the HOF fold is asserted only on minhashLsh's input
  // domain (equal-length non-null signatures). Off-domain, eq_count is
  // intentionally STRICTER than zip_with padding: mismatch/null -> null,
  // not a silently-low count (ADVICE r6).
  test("codegen eq_count matches the HOF fold on the signature domain; stricter off it") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 100).map { i =>
      val d = 1 + rnd.nextInt(32)
      // force frequent agreements: small value domain
      (i.toLong, Array.fill(d)(rnd.nextInt(3).toLong), Array.fill(d)(rnd.nextInt(3).toLong))
    }
    val df = rows.toDF("id", "a", "b")
    def hofEq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v)
    val diff = df.select(
      graft.functions.EqCountFn.eqCount(col("a"), col("b")).as("fast"),
      hofEq(col("a"), col("b")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0)
    val mism = Seq((Array(1L, 2L), Array(1L))).toDF("a", "b")
      .select(graft.functions.EqCountFn.eqCount(col("a"), col("b")).as("c")).head()
    assert(mism.isNullAt(0), "length mismatch -> null (stricter than zip_with padding)")
  }

  test("codegen dot null/length semantics mirror the zip_with fold") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),   // ok
      (2L, Array(1.0f, 2.0f), Array(3.0f)),          // length mismatch -> null
      (3L, Array(1.0f), Array(5.0f))                 // ok
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), V.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L) == Some(11.0))
    assert(got(2L) == None, "length mismatch must yield null like zip_with padding")
    assert(got(3L) == Some(5.0))
    val withNullArr = df.select(V.dot(lit(null).cast("array<float>"), col("b")).as("d"))
      .collect()
    assert(withNullArr.forall(_.isNullAt(0)), "null array -> null")
  }
}
