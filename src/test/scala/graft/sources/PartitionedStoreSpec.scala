package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PartitionedStoreSpec extends SparkSpec {

  test("partitioned write prunes directories at planning time") {
    val dir = Files.createTempDirectory("graft_part").toString
    val events = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
    PartitionedStore.writePartitioned(events, dir, Seq("l_returnflag"))

    val back = PartitionedStore.readPartitioned(spark, dir)
      .filter(col("l_returnflag") === "R")
    // row parity with the unpartitioned source... (executing THIS plan
    // instance, so its scan metrics are the ones populated)
    val qe = back.queryExecution
    val want = events.filter(col("l_returnflag") === "R").count()
    assert(want > 0 && qe.executedPlan.execute().count() == want)
    // ...and the executed scan only TOUCHED the R directory:
    // planning-time pruning, not a read-then-filter — inputFiles would
    // list all three dirs because it reflects the unpruned file index
    val scan = qe.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.metadata("PartitionFilters").contains("l_returnflag"),
      scan.metadata("PartitionFilters"))
    assert(scan.metrics("numFiles").value == 1,
      s"read ${scan.metrics("numFiles").value} files, wanted 1")
  }

  test("co-bucketed tables join with zero exchanges") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    assert(warehouse.nonEmpty)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    PartitionedStore.writeBucketed(orders, "bkt_orders", "o_orderkey", 8)
    PartitionedStore.writeBucketed(lineitem, "bkt_lineitem", "l_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the join would NEED a shuffle without buckets
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_orders")
        .join(spark.table("bkt_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"expected no exchange, got ${exchanges.size}")
      // and the bucketed join still returns the right rows
      val want = orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == want && want > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }
}
