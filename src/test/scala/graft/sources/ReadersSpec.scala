package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S4/S5/S6/F7 read-side semantics. */
class ReadersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("F7: pathGlobFilter prunes non-matching files at the source") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_f7").toString
    Seq("a", "b").toDF("text").coalesce(1).write.json(s"$base/data")
    // plant a non-json file the scan must skip
    Files.writeString(Paths.get(s"$base/data/junk.txt"), "not json at all")
    val df = spark.read
      .option("pathGlobFilter", "*.json")
      .schema("text STRING")
      .json(s"$base/data")
    assert(df.count() == 2)
    assert(df.filter(col("text").isNull).count() == 0)
  }

  test("S6: JSON to single-column parquet conversion (schema'd, streaming-safe)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_s6").toString
    Seq(("d1", "ana are mere", 3), ("d2", "text românesc cu țâșnițe", 7))
      .toDF("id", "text", "extra")
      .write.json(s"$base/json")
    // the reference's parquet.py: incremental parse, 1-col schema text:string
    spark.read.schema("id STRING, text STRING, extra INT").json(s"$base/json")
      .select("text")
      .write.parquet(s"$base/parquet")
    val back = spark.read.parquet(s"$base/parquet")
    assert(back.schema.fieldNames.sameElements(Array("text")))
    // byte fidelity through the JSON→parquet round trip (diacritics)
    val texts = back.as[String].collect().sorted
    assert(texts.sameElements(Array("ana are mere", "text românesc cu țâșnițe")))
  }

  test("S5: multi-file directory read unions all shards") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_s5").toString
    (0 until 3).foreach { i =>
      Seq(s"shard$i").toDF("text").write.json(s"$base/dir/part_$i")
    }
    val df = spark.read.schema("text STRING").json(s"$base/dir/part_*")
    assert(df.count() == 3)
  }
}
