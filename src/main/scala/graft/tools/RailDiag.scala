package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: why does q_simhash_canonical's components() call run the
  * distributed rounds at sf0.1 instead of the union-find rail? Prints the
  * rep count, the rep pair-graph edge count, its schema, and the hot-bucket
  * census of the chunk-pair blocking. */
object RailDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.DedupSim.docsWithMutants(spark, sfDir)
    val sigs = graft.ops.Dedup.simhashes(docs).filter(col("simhash").isNotNull)
    val reps = sigs.groupBy(col("simhash")).agg(min(col("doc_id")).as("rep_id"))
    println(s"docs=${docs.count()} sigs=${sigs.count()} reps=${reps.count()}")
    val pairs = graft.ops.Dedup.hammingNearDupPairs(
      graft.ops.Stage.barrier(reps), 6, idCol = "rep_id", sigCol = "simhash")
    println("pairs schema: " + pairs.schema.map(f => s"${f.name}:${f.dataType}").mkString(","))
    println(s"pairs=${pairs.count()}")
    // the FULL-doc pair graph (what splitLeakage's components now runs on)
    val fullPairs = graft.ops.Dedup.simhashNearDupPairs(docs)
    println(s"fullPairs=${fullPairs.count()}")
    // hot-bucket census of the blocking
    val defs = graft.ops.Dedup.chunkPairDefs(col("simhash"))
    val blocked = reps.select(col("rep_id"),
      explode(array(defs.map { case (b, k) =>
        struct(lit(b).as("blk"), k.as("key")) }: _*)).as("ck"))
    val census = blocked.groupBy(col("ck.blk"), col("ck.key"))
      .agg(count(lit(1)).as("n"))
    census.orderBy(desc("n")).show(10, false)
    println("candidate pair mass = " +
      census.agg(sum(col("n") * (col("n") - 1) / 2)).head.get(0))
    spark.stop()
  }
}
