package graft

import org.apache.spark.sql.functions._

/** Bucketing = the pre-partitioned co-located join (SURVEY.md §1.3 /
  * "Partitioning & shuffle" brief): both fact tables bucketed on the join
  * key join with ZERO exchange — at 100 TB this turns the nightly
  * lineitem⋈orders from two full shuffles into a local zip per bucket.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join on the bucket key plans no shuffle exchange") {
    // external tables (explicit path) so the static warehouse dir is unused
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Tables(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
    Tables(spark, sf0001, "orders")
      .select("o_orderkey", "o_orderpriority")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/o_b").mode("overwrite").saveAsTable("o_b")

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val li = spark.table("li_b")
      val o = spark.table("o_b")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucketed scan on both sides: the join itself needs no exchange
      // (only the tiny post-join aggregation shuffles)
      assert(plan.contains("SortMergeJoin"), plan)
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"), joinPart)
      assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"), joinPart)
      // and it still computes the right thing
      val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val plain = Tables(spark, sf0001, "lineitem").select("l_orderkey")
        .join(Tables(spark, sf0001, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets === plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
