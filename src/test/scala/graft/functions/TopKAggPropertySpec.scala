package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Randomized equivalence of the bounded top-k aggregate against the
  * rank-window reference implementation: many groups, duplicate scores
  * (forcing id tie-breaks), duplicate (score, id) rows, empty-ish groups,
  * and a repartition to force the partial-buffer merge path. */
class TopKAggPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)))

  val rowGen: Gen[(Long, Long, Double)] = for {
    group <- Gen.chooseNum(0L, 12L)
    id <- Gen.chooseNum(0L, 40L)
    // small score domain → heavy ties; occasional negatives and repeats
    score <- Gen.oneOf(Gen.chooseNum(-3, 3).map(_.toDouble / 2.0),
      Gen.const(0.5))
  } yield (group, id, score)

  test("TopKVecAgg == TopKAgg ranking with the right payload attached, " +
      "k in {1,3,7}") {
    // same randomized tied data; the payload is a per-(group,id) vector,
    // so carrying it through the aggregate must change NOTHING about the
    // ranking and must attach the vector of exactly the surviving id
    val rows = samples(rowGen, 2000)
    val df = rows.toDF("query_id", "neighbor_id", "sim")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("vec", array(col("neighbor_id").cast("double"),
        (col("neighbor_id") * 2 + col("query_id")).cast("double")))
      .repartition(16) // forces the serialize/merge partial-buffer path
      .cache()
    for (k <- Seq(1, 3, 7)) {
      val plain = df.groupBy(col("query_id"))
        .agg(TopKAgg.topKBy(col("sim"), col("neighbor_id"), k).as("top"))
        .select(col("query_id"), explode(col("top")).as("t"))
        .select(col("query_id"), col("t.score"), col("t.id"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .toSet
      val withVec = df.groupBy(col("query_id"))
        .agg(TopKVecAgg.topKByVec(col("sim"), col("neighbor_id"),
          col("vec"), k).as("top"))
        .select(col("query_id"), explode(col("top")).as("t"))
        .collect().map { r =>
          val t = r.getStruct(1)
          val vec = t.getSeq[Double](2)
          // the payload is the surviving id's vector, element for element
          assert(vec == Seq(t.getLong(1).toDouble,
            (t.getLong(1) * 2 + r.getLong(0)).toDouble))
          (r.getLong(0), t.getDouble(0), t.getLong(1))
        }.toSet
      assert(withVec == plain, s"k=$k")
    }
  }

  test("TopKAgg == rank-window on randomized tied data, k in {1,3,7}") {
    val rows = samples(rowGen, 2000)
    val df = rows.toDF("query_id", "neighbor_id", "sim")
      // the window reference needs distinct (group, id) rows — row_number
      // over duplicate (sim, id) pairs is nondeterministic between them
      .dropDuplicates("query_id", "neighbor_id")
      .repartition(16)
      .cache()
    for (k <- Seq(1, 3, 7)) {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(desc("sim"), col("neighbor_id"))
      val windowed = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("sim"), 6).as("sim_r"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3))).toSet
      val agg = graft.ops.Similarity.topKRank(df, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3))).toSet
      assert(agg == windowed, s"k=$k: ${(agg -- windowed).take(3)} vs " +
        s"${(windowed -- agg).take(3)}")
    }
  }
}
