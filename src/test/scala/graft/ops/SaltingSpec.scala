package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltingSpec extends SparkSpec {

  // one hot key owning half the rows, the rest spread over 50 cold keys
  private lazy val big = spark.range(10000).select(
    when(col("id") % 2 === 0, lit("hot"))
      .otherwise(concat(lit("k"), col("id") % 50)).as("key"),
    col("id").as("v"))

  test("saltedCountSum equals the plain groupBy on a skewed key") {
    val plain = big.groupBy(col("key"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_value"))
      .orderBy(col("key")).collect().toSeq
    val salted = Salting.saltedCountSum(big, "key", "v", "v")
      .orderBy(col("key")).collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin equals the plain join, including duplicate dim keys") {
    import spark.implicits._
    // dim with a duplicated key: every matching big row must appear once
    // per dim occurrence, exactly as in the plain join
    val dim = spark.range(51).select(
      when(col("id") === 50, lit("hot"))
        .otherwise(concat(lit("k"), col("id"))).as("key"),
      (col("id") * 7).as("w"))
      .union(Seq(("hot", 999L)).toDF("key", "w"))
    val plain = big.join(dim, Seq("key"))
      .orderBy(col("key"), col("v"), col("w")).collect().toSeq
    val salted = Salting.saltedJoin(big, dim, "key", "v")
      .select(col("key"), col("v"), col("w"))
      .orderBy(col("key"), col("v"), col("w")).collect().toSeq
    assert(salted == plain)
  }

  test("the hot key actually spreads across salt buckets") {
    val buckets = big.filter(col("key") === "hot")
      .select(Salting.salt(16, col("v")).as("s"))
      .distinct().count()
    assert(buckets == 16)
  }
}
