package graft.tools

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Sorted-probe jaccard for the A/B only — same hits/null semantics as
  * the library's `jaccard_sets` (which dispatches the HASH probe for
  * strings after this A/B), membership via
  * [[graft.functions.ArrayMath.jaccardStringSets]].
  */
case class JaccardSetsSortedExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sets_sorted requires two array<string>, got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.ArrayMath.jaccardStringSets(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c1, c2) =>
      s"graft.functions.ArrayMath.jaccardStringSets($c1, $c2)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaccardSetsSortedExpr = copy(l, r)
  override def prettyName: String = "jaccard_sets_sorted"
}

/** Focused interleaved A/B/C for the PREFIX-JOIN VERIFY stage — the
  * string-token twin of the r6 `jaccard_sets` rewrite, after bench
  * singles suggested the sorted-probe native reads slower than the ANSI
  * algebra it replaced on exactly the two string-element call sites
  * (q_dedup_jaccard_group/freq) while the four long-element sites sit at
  * their floors.
  *
  * Builds the sf0.1 q_dedup_jaccard_group pipeline (hash token order,
  * t = 0.9, assumeUniqueIds) up to the MATERIALIZED candidate and set
  * frames — identical inputs for every variant — then times only the
  * verify stage (two merge joins + jaccard column + threshold filter)
  * to a noop sink, interleaved rounds:
  *
  *   A: size(array_intersect)/(|A|+|B|−i) — the pre-cbb48a3 algebra
  *   B: sorted-probe native (the cbb48a3 string dispatch)
  *   C: hash-probe native (the post-A/B `jaccard_sets` string dispatch)
  *
  * First run (HEAD = cbb48a3 dispatch, sf0.1, identical 48,169-pair
  * outputs all variants): A 0.61–0.64 s, B 0.68–0.74 s, C 0.39–0.43 s —
  * the regression is real and the hash probe beats both, so the library
  * expression now dispatches C for strings (longs keep the primitive
  * sorted probe, which has no boxing and no loss to measure).
  *
  * Usage: `runMain graft.tools.JaccardVerifyAB [sfDir] [rounds]`.
  */
object JaccardVerifyAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val minJaccard = 0.9

    // the q_dedup_jaccard_group construction (hash order, unique ids)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = docs.select(col("source").as("grp"), col("doc_id").as("id"),
      array_distinct(split(col("text"), " ")).as("toks"))
    val sets = base
      .withColumn("sh", graft.functions.ArrayMath.sort_by_xxhash(col("toks")))
      .select(col("grp"), col("id"), col("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sz", size(col("sh")))
      .withColumn("prefix", slice(col("sh"), lit(1),
        (col("sz") - ceil(col("sz") * minJaccard - lit(1e-9)) + 1)
          .cast("int")))
      .transform(graft.analytics.Materialize.apply)
    val toks = graft.analytics.Materialize.partitionedBy(
      sets.select(col("grp"), col("id"), col("sz"),
        posexplode(col("prefix")).as(Seq("pos", "tok"))),
      col("grp"), col("tok"))
    val sizeOk =
      col("x.sz").cast("double") >= lit(minJaccard) * col("y.sz") - 1e-9 &&
      col("y.sz").cast("double") >= lit(minJaccard) * col("x.sz") - 1e-9
    val posOk =
      least(col("x.sz") - col("x.pos"), col("y.sz") - col("y.pos"))
        .cast("double") >=
        lit(minJaccard / (1.0 + minJaccard)) * (col("x.sz") + col("y.sz")) -
          1e-9
    val cand = graft.analytics.Materialize(
      toks.as("x").join(toks.as("y").hint("merge"),
          col("x.grp") === col("y.grp") && col("x.tok") === col("y.tok") &&
            col("x.id") < col("y.id") && sizeOk && posOk)
        .select(col("x.grp").as("grp"), col("x.id").as("id_a"),
          col("y.id").as("id_b"))
        .distinct())
    val verify = sets.select(col("grp"), col("id"), col("sh")).hint("merge")
    println(s"docs=${docs.count()} sets=${sets.count()} cand=${cand.count()}")

    def frame(jac: (Column, Column) => Column): DataFrame =
      cand
        .join(verify.withColumnRenamed("id", "id_a")
          .withColumnRenamed("sh", "sh_a"), Seq("grp", "id_a"))
        .join(verify.withColumnRenamed("id", "id_b")
          .withColumnRenamed("sh", "sh_b"), Seq("grp", "id_b"))
        .withColumn("jaccard", jac(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= minJaccard)
        .select(col("grp"), col("id_a"), col("id_b"),
          round(col("jaccard"), 6).as("jaccard"))
    def run(jac: (Column, Column) => Column): Unit =
      frame(jac).write.format("noop").mode("overwrite").save()
    val algebra = (a: Column, b: Column) => {
      val inter = size(array_intersect(a, b))
      inter.cast("double") / (size(a) + size(b) - inter)
    }
    val native = (a: Column, b: Column) =>
      ColumnShim.column(
        JaccardSetsSortedExpr(ColumnShim.expr(a), ColumnShim.expr(b)))
    val hashed = (a: Column, b: Column) =>
      graft.functions.ArrayMath.jaccard_sets(a, b)

    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    // one-shot equivalence check on the full verified output, then
    // warm all three and interleave (noop sink only in the timed region)
    val expect = frame(algebra).orderBy("grp", "id_a", "id_b")
      .collect().toSeq
    require(frame(native).orderBy("grp", "id_a", "id_b")
      .collect().toSeq == expect, "sorted-probe output diverges")
    require(frame(hashed).orderBy("grp", "id_a", "id_b")
      .collect().toSeq == expect, "hash-probe output diverges")
    println(s"verified pairs=${expect.size} — all three variants identical")
    run(algebra); run(native); run(hashed)
    for (r <- 1 to rounds) {
      val ta = time(() => run(algebra))
      val tb = time(() => run(native))
      val tc = time(() => run(hashed))
      println(f"round $r: A(algebra) $ta%.2f s   B(sorted-probe) $tb%.2f s" +
        f"   C(hash-probe) $tc%.2f s")
    }
    spark.stop()
  }
}
