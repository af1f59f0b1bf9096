package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("copy counts: rate<100 keeps a ~rate% subset, rate>100 upsamples") {
    val df = (0L until 1000L).toDF("id")
    val kept40 = df.select(Sampling.copies(col("id"), lit(40)).as("n"))
      .as[Int].collect()
    assert(kept40.forall(n => n == 0 || n == 1))
    assert(math.abs(kept40.sum - 400) < 60) // hash spread, not exact
    val up250 = df.select(Sampling.copies(col("id"), lit(250)).as("n"))
      .as[Int].collect()
    assert(up250.forall(n => n == 2 || n == 3))
    assert(math.abs(up250.sum - 2500) < 60)
  }

  test("resample emits exactly copies() rows per id, deterministically") {
    val df = (0L until 500L).toDF("id").withColumn("rate", lit(137))
    val out = Sampling.resample(df, col("id"), col("rate"))
    val perId = out.groupBy("id").count().as[(Long, Long)].collect().toMap
    val expected = df.select(col("id"), Sampling.copies(col("id"), col("rate")).as("n"))
      .as[(Long, Int)].collect().toMap
    expected.foreach { case (id, n) =>
      assert(perId.getOrElse(id, 0L) == n.toLong, s"id $id")
    }
    // copy_idx enumerates 1..n
    val idx = out.filter(col("id") === expected.find(_._2 == 2).get._1)
      .select("copy_idx").as[Int].collect().sorted.toSeq
    assert(idx == Seq(1, 2))
    // rerun is bit-identical (no rand() anywhere)
    assert(out.orderBy("id", "copy_idx").collect().toSeq ==
      Sampling.resample(df, col("id"), col("rate")).orderBy("id", "copy_idx").collect().toSeq)
  }

  test("priority sample matches an independent JVM md5 reference, any partitioning") {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 400L).map(i => (i, 1L + rnd.nextInt(100)))
    def refUniform(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / 281474976710657.0
    }
    val want = rows.map { case (id, w) => (id, w / refUniform(id)) }
      .sortBy(-_._2).take(20).map(_._1).toList
    Seq(1, 16).foreach { parts =>
      val got = Sampling.samplePriority(
        rows.toDF("id", "w").repartition(parts), col("id"), col("w"), 20)
        .orderBy(col("priority").desc).select("id").as[Long].collect().toList
      assert(got == want, s"parts=$parts")
    }
  }

  test("per-group priority sample takes exactly k per stratum, deterministically") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 300L).map(i => (i, s"src${i % 3}", 1L + rnd.nextInt(50)))
    val df = rows.toDF("id", "src", "w")
    Seq(1, 16).foreach { parts =>
      val got = Sampling.samplePriorityPerGroup(
        df.repartition(parts), col("id"), col("w"), col("src"), 4)
        .select("src", "id").as[(String, Long)].collect().toSet
      // independent reference: global priorities, top-4 per group
      val want = rows.groupBy(_._2).toSeq.flatMap { case (src, rs) =>
        rs.map { case (id, _, w) =>
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.substring(0, 12)
          val u = (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / 281474976710657.0
          (src, id, w / u)
        }.sortBy(-_._3).take(4).map(t => (t._1, t._2))
      }.toSet
      assert(got == want, s"parts=$parts")
      assert(got.groupBy(_._1).forall(_._2.size == 4))
    }
  }

  test("rate 0 drops everything; rate 100 is the identity") {
    val df = (0L until 100L).toDF("id")
    assert(Sampling.resample(df, col("id"), lit(0)).count() == 0L)
    assert(Sampling.resample(df, col("id"), lit(100)).count() == 100L)
  }
}
