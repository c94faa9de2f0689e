package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.synth.SynthPages

/** Salted join/aggregate equal their unsalted plans on the zipf-host corpus
  * (FIXTURES.md `skew` family — the head host holds a large share of rows).
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def pagesWithHost = {
    import spark.implicits._
    SynthPages.pages(spark, 3000L).toDF()
      .withColumn("host", regexp_extract(col("url"), "https://([^/]+)/", 1))
      .select("url", "host", "lang")
  }

  test("the synthetic corpus is actually host-skewed (zipf head)") {
    val top = pagesWithHost.groupBy("host").count()
      .orderBy(col("count").desc).head()
    assert(top.getLong(1) > 3000 / 20, s"head host only ${top.getLong(1)} rows")
  }

  test("saltedJoin equals the plain join") {
    import spark.implicits._
    val pages = pagesWithHost
    val dim = pages.select("host").distinct()
      .withColumn("host_cat",
        when(length(col("host")) % 2 === 0, "even").otherwise("odd"))
    val plain = pages.join(dim, "host")
      .groupBy("host_cat").count().orderBy("host_cat").collect()
    val salted = SkewJoin.saltedJoin(pages, dim, "host", col("url"), salt = 8)
      .groupBy("host_cat").count().orderBy("host_cat").collect()
    assert(plain.sameElements(salted))
  }

  test("saltedAggregate equals the plain aggregate") {
    val pages = pagesWithHost.withColumn("v", length(col("url")).cast("double"))
    val plain = pages.groupBy("host")
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
      .orderBy("host").collect()
    val salted = SkewJoin.saltedAggregate(pages, "host", col("url"), col("v"),
      salt = 8).orderBy("host").collect()
    assert(plain.length == salted.length)
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getString(0) == s.getString(0))
      assert(p.getLong(1) == s.getLong(1))
      assert(math.abs(p.getDouble(2) - s.getDouble(2)) < 1e-6)
    }
  }
}
