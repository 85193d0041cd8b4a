package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** A/B of the two leakage-safe split shapes over the SAME mutant corpus
  * q_split_safe benches:
  *
  *  - **recompute** ([[graft.ops.Sampling.leakageSafeSplits]]): re-derives
  *    the near-dup cluster map per run — what the in-suite q_split_safe
  *    number measures, and ~the whole of it, since the map IS the cost.
  *  - **production** ([[graft.ops.Sampling.leakageSafeSplitsFrom]]): reads
  *    the dedup stage's canonical map back from a doc_id-bucketed table
  *    ([[graft.sources.PartitionedStore.writeBucketed]]) and joins the
  *    split onto the corpus — the map side reads its buckets in place
  *    (zero exchange, plan-asserted in LeakageSplitSpec and counted
  *    here), so the marginal cost of splitting is ~a bucketed join, not
  *    a re-clustering.
  *
  * Prints ONE JSON line: materialize (the dedup stage's own write,
  * amortized — it exists for dedup regardless of splitting), recompute
  * vs production seconds (min of reps), and the production plan's
  * exchange count.
  *
  * Usage: SplitShapeBench [sfDir] [reps]  (defaults: target/sf1, 2)
  */
object SplitShapeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(f: => Long): Double = (1 to reps).map { _ =>
      val t = time(f); graft.ops.Stage.releaseAll(spark); t
    }.min

    val docs = graft.queries.DedupSim.docsWithMutants(spark, sfDir)

    // the dedup stage's map write — amortized in production (the map is
    // the dedup deliverable; splitting only re-reads it)
    val tag = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"/tmp/graft_splitmap_bench/$tag"
    val tMaterialize = time {
      graft.sources.PartitionedStore.writeBucketed(
        graft.ops.Dedup.simhashCanonical(docs), "bkt_split_map_bench",
        path, "doc_id", cpus.toInt, Seq("doc_id"))
      graft.ops.Stage.releaseAll(spark)
      0L
    }

    // recompute shape: the cluster map re-derived per run
    val tRecompute = best(
      graft.ops.Sampling.leakageSafeSplits(docs).count())

    // production shape: split from the bucketed map + join onto the
    // corpus. autoBroadcast OFF for this section: at bench scale the
    // planner rightly broadcasts the small map, but the claim under
    // measurement is the AT-SCALE plan — corpus too big to broadcast,
    // map side reading its buckets in place with zero exchange (the
    // contract LeakageSplitSpec plan-asserts); the broadcast plan is
    // strictly cheaper when the map fits, so this measurement is the
    // conservative one.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def production = docs.join(
      graft.ops.Sampling.leakageSafeSplitsFrom(
        spark.table("bkt_split_map_bench")),
      Seq("doc_id"))
    val planStr = production.queryExecution.executedPlan.toString
    val nShuffles = "Exchange ".r.findAllIn(planStr).size -
      "BroadcastExchange ".r.findAllIn(planStr).size
    val bucketed = planStr.contains("Bucketed: true")
    val tProduction = best(production.count())
    // the split table alone (no corpus join) — the pure map re-read
    val tSplitOnly = best(graft.ops.Sampling.leakageSafeSplitsFrom(
      spark.table("bkt_split_map_bench")).count())

    println(s"""{"metric":"split_shape","sf":"$sfDir","reps":$reps,""" +
      s""""materialize_map_sec":$tMaterialize,""" +
      s""""recompute_sec":$tRecompute,""" +
      s""""production_join_sec":$tProduction,""" +
      s""""split_only_sec":$tSplitOnly,""" +
      s""""production_shuffles":$nShuffles,""" +
      s""""map_scan_bucketed":$bucketed}""")
    spark.sql("DROP TABLE IF EXISTS bkt_split_map_bench")
    spark.stop()
  }
}
