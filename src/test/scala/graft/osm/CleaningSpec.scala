package graft.osm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions.capwords

/** Unit vectors from FIXTURES.md §4 (observed in case_study_osm.pdf p.6 and
  * parse_clean_and_csv.py behavior). */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  val phoneVectors: Seq[(String, String)] = Seq(
    "2196 8170" -> "+852 21968170",
    "+ 852 2522 0922" -> "+852 25220922",
    "+85227822682" -> "+852 27822682",
    "(+852) 2529 9280" -> "+852 25299280",
    "852-2522-1184" -> "+852 25221184",
    "+85 22 19 21222" -> "+852 21921222",
    "+852 31051830, +852 31041831, +852 31051832" ->
      "+852 31051830;+852 31041831;+852 31051832",
    "+8613590258862" -> "+86 13590258862",
    "13714841831" -> "+86 13714841831",
    "+86 0755-86378888" -> "+86 755 86378888",
    "0755 8618 4166" -> "+86 755 86184166",
    "+41 44 586 00 04" -> "+41 44 586 00 04", // non-HK/PRC unchanged
    "survey" -> "survey", // not a phone at all
    "＋852 2345 6789" -> "+852 23456789", // full-width plus
    // partial match: unmatched segments are DROPPED (ref
    // parse_clean_and_csv.py:512-517 keeps only matched numbers)
    "+852 31051830, +41 44 586 00 04" -> "+852 31051830",
    "852" -> "852", // too short, unchanged
    "" -> "") // empty passes through

  test("phone canonicalization vectors") {
    val got = phoneVectors.map(_._1).toDF("v")
      .select(col("v"), PhoneFix.fixPhoneValue(col("v")).as("fixed"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    phoneVectors.foreach { case (in, want) =>
      assert(got(in) == want, s"input <$in>")
    }
  }

  test("phone canonicalization is idempotent") {
    val once = phoneVectors.map(_._2).toDF("v")
      .select(col("v"), PhoneFix.fixPhoneValue(col("v")).as("fixed"))
      .collect()
    once.foreach(r => assert(r.getString(1) == r.getString(0),
      s"not idempotent on <${r.getString(0)}>"))
  }

  test("capwords matches python string.capwords semantics") {
    val vectors = Seq(
      "A KUNG KOK STREET" -> "A Kung Kok Street",
      "D'AGUILAR STREET" -> "D'aguilar Street", // != initcap
      "BOULEVARD DE CASCADE" -> "Boulevard De Cascade",
      "MCGREGOR STREET" -> "Mcgregor Street",
      "  spaced   out  " -> "Spaced Out", // whitespace runs collapse
      "半山徑　" -> "半山徑") // U+3000 is whitespace for \s? checked below
    val got = vectors.map(_._1).toDF("v")
      .select(col("v"), capwords(col("v")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    vectors.foreach { case (in, want) =>
      assert(got(in) == want, s"input <$in>")
    }
  }

  test("capwords stays inside whole-stage codegen") {
    // non-foldable input (range) so the expression survives constant folding
    val df = spark.range(3)
      .select(capwords(concat(lit("ab cd "), col("id").cast("string")))
        .as("c"))
    // "*(n)" marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [capwords"), plan)
    assert(df.collect().map(_.getString(0)).toSet ==
      Set("Ab Cd 0", "Ab Cd 1", "Ab Cd 2"))
  }
}
