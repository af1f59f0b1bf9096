package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.SparkSpec
import graft.core.Tables

class BucketedSpec extends SparkSpec {

  test("bucketed-by-key join plans no shuffle exchange") {
    val d = "/root/testdata/sf0.001"
    Bucketed.write(Tables.orders(spark, d)
      .withColumnRenamed("o_custkey", "k"), "b_orders", "k", 4)
    Bucketed.write(Tables.customer(spark, d)
      .withColumnRenamed("c_custkey", "k"), "b_customer", "k", 4)
    // disable broadcast so the join must pick sort-merge on the bucket key
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.read(spark, "b_orders")
        .join(Bucketed.read(spark, "b_customer"), Seq("k"))
      joined.count() // materialize with final plan
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
