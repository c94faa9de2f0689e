package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S2/S3/S7 sink semantics. */
class WritersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("S2: sharded write bounds rows per file and derives shard_id") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_s2").toString
    val df = (0L until 5000L).toDF("row_id")
    Writers.writeSharded(df, "row_id", base, shardSize = 1300)
    val back = spark.read.parquet(base)
    assert(back.count() == 5000)
    // shard_id = rowId / 1300
    assert(back.filter(col("row_id") === 1300L).select("shard_id")
      .head().getInt(0) == 1)
    assert(back.groupBy("shard_id").count().count() == 4) // 0..3
    // no data file exceeds the shard size
    import scala.jdk.CollectionConverters._
    val files = Files.list(java.nio.file.Paths.get(base)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    files.foreach { f =>
      val n = spark.read.parquet(f.toString).count()
      assert(n <= 1300, s"$f has $n rows")
    }
  }

  test("S2 JSON: diacritic text is written as raw UTF-8 bytes and " +
      "round-trips byte-identical (ensure_ascii=False parity)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_s2json").toString
    val texts = Seq("ăâîșț ȘȚĂÂÎ — „ghilimele” și şţ comb",
      "plain ascii", "mixed: Țară, înțelegere, copacă")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("row_id", "text")
    Writers.writeShardedJson(df, "row_id", base, shardSize = 1300)
    // on-disk bytes: the diacritics appear as raw UTF-8, never \uXXXX
    import scala.jdk.CollectionConverters._
    val payload = Files.list(java.nio.file.Paths.get(base)).iterator().asScala
      .filter(_.toString.endsWith(".json"))
      .map(p => new String(Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8))
      .mkString("\n")
    assert(payload.contains("ăâîșț"), "diacritics must be raw UTF-8 on disk")
    assert(!payload.contains("\\u0103"), "ASCII-escaped ă found — " +
      "ensure_ascii=False parity broken")
    // round trip: byte-identical text per row id
    val back = spark.read.json(base).select("row_id", "text")
      .as[(Long, String)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(back(i.toLong).getBytes("UTF-8").sameElements(t.getBytes("UTF-8")),
        s"row $i bytes diverge after JSON round trip")
    }
  }

  test("S3: dual write produces identical primary and backup") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_s3").toString
    val df = (0 until 500).map(i => (i, s"doc$i")).toDF("id", "text")
    Writers.writeDual(df, s"$base/primary", s"$base/backup")
    val p = spark.read.parquet(s"$base/primary").orderBy("id").collect()
    val b = spark.read.parquet(s"$base/backup").orderBy("id").collect()
    assert(p.length == 500 && p.sameElements(b))
  }

  test("S7: typed export casts int_score to string (ERROR stays in-band)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_s7").toString
    val df = Seq((1, "3"), (2, "ERROR")).toDF("id", "int_score")
      .withColumn("int_score",
        when(col("int_score") =!= "ERROR", col("int_score").cast("int"))
          .otherwise(lit(null)))
    // the export path takes the typed column and emits string
    Writers.exportTyped(
      df.withColumn("int_score", coalesce(col("int_score").cast("string"),
        lit("ERROR"))), base)
    val back = spark.read.parquet(base).orderBy("id").collect()
    assert(back(0).getString(1) == "3")
    assert(back(1).getString(1) == "ERROR")
    assert(spark.read.parquet(base).schema("int_score").dataType.typeName == "string")
  }
}
