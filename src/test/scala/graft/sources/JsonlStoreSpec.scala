package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.SparkSpec

class JsonlStoreSpec extends SparkSpec {

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  test("jsonl round-trip preserves rows and content") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "quote \" and \\ slash"),
      (3L, "unicode – ok")).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_jsonl").toString
    JsonlStore.writeJsonl(docs, dir)
    val back = JsonlStore.readJsonl(spark, dir, schema)
    assert(back.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "hello world"), (2L, "quote \" and \\ slash"),
        (3L, "unicode – ok")))
  }

  test("streaming jsonl ingestion reduces to the batch aggregate") {
    import spark.implicits._
    val docs = (1L to 60L)
      .map(i => (i, s"src_${i % 3}", s"text number $i"))
      .toDF("doc_id", "source", "text")
    val dir = Files.createTempDirectory("graft_jsonl_stream").toString
    JsonlStore.writeJsonl(docs, dir)
    val sch = new StructType().add("doc_id", LongType)
      .add("source", StringType).add("text", StringType)
    val counts = JsonlStore.readJsonlStream(spark, dir, sch)
      .groupBy(col("source"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"),
        sum(col("doc_id")).as("sum_id"))
    val got = graft.streaming.EventStream.runToMemory(counts,
      "jsonl_stream",
      org.apache.spark.sql.streaming.OutputMode.Complete)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val want = docs.groupBy(col("source"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"),
        sum(col("doc_id")).as("sum_id"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == want && want.size == 3)
  }

  test("quarantining scan: bad lines captured, clean rows flow") {
    val dir = Files.createTempDirectory("graft_jsonl_dirty")
    Files.writeString(Paths.get(dir.toString, "part-0.jsonl"),
      """{"doc_id": 1, "text": "good row"}
        |this line is not json at all
        |{"doc_id": 2, "text": "also good"}
        |{"doc_id": 3, "text": truncated
        |""".stripMargin)
    val quarantine = Files.createTempDirectory("graft_jsonl_q").toString
    val clean = JsonlStore.readJsonlQuarantined(spark, dir.toString,
      schema, quarantine)
    assert(clean.select(col("doc_id")).orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val quarantined = spark.read.text(quarantine).collect()
      .map(_.getString(0)).sorted
    assert(quarantined.length == 2)
    assert(quarantined.exists(_.contains("not json")))
    assert(quarantined.exists(_.contains("truncated")))
    graft.ops.Stage.releaseAll(spark)
  }
}
