package graft.operators

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // one hot key (90% of rows) + tail
    val big = ((1 to 900).map(_ => (1L, "hot")) ++
      (1 to 100).map(i => (i.toLong + 1, s"cold$i"))).toDF("k", "payload")
    val small = (1 to 50).map(i => (i.toLong, s"dim$i")).toDF("k", "attr")
    val plain = big.join(small, Seq("k"))
    val salted = SkewJoin.saltedInner(big, small, Seq("k"), saltFactor = 8)
    assert(salted.count() == plain.count())
    val a = plain.orderBy("k", "payload", "attr").collect().toSeq
    val b = salted.orderBy("k", "payload", "attr").collect().toSeq
    assert(a == b)
  }
}
