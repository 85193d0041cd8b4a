package graft.functions

import org.apache.spark.sql.functions._

import graft.{GraftExtensions, SparkSpec}
import graft.ops.Dedup

class NativeFunctionsSpec extends SparkSpec {

  test("native MinHashAgg equals the declarative 64-column form") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val declarative = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = Dedup.minhashSignaturesNative(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet == declarative.keySet)
    native.foreach { case (id, sig) =>
      assert(sig == declarative(id), s"doc $id")
    }
  }

  test("capwords is callable from SQL once extensions are registered") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT capwords('hello SPARK world') AS c")
      .head().getString(0)
    assert(got == "Hello Spark World")
  }
}
