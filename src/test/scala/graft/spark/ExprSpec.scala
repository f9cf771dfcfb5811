package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Native [[DotProduct]] expression + [[RewriteHofDotProduct]] optimizer
  * rule: the rewrite must be a PURE optimization — bit-identical results
  * to the interpreted HOF composition on every input shape, including the
  * null/length edge semantics — and must actually fire on the declarative
  * formulation the registered queries use.
  */
class ExprSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    // extensions apply at session creation: make sure this suite owns one
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("expr-spec")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  test("rewrite rule fires on the declarative HOF composition and results are identical") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(29)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(64)(rng.nextDouble() * 2 - 1), Seq.fill(64)(rng.nextDouble() * 2 - 1))
    }.toDF("id", "a", "b")
    // repartition defeats ConvertToLocalRelation (which would eagerly fold
    // a projection over a local Seq before the plan is observable)
    val df = rows.repartition(2).select($"id", hofDot($"a", $"b").as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), s"rewrite did not fire:\n$optimized")
    assert(!optimized.contains("aggregate("), s"HOF survived the rewrite:\n$optimized")
    // ground truth computed in plain Scala with the same ascending loop
    val expected = rows.collect().map { r =>
      val a = r.getSeq[Double](1)
      val b = r.getSeq[Double](2)
      var t = 0.0
      var i = 0
      while (i < 64) { t += a(i) * b(i); i += 1 }
      r.getLong(0) -> t
    }.toMap
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expected) // bit-identical doubles, not approximate
  }

  test("null/length edge semantics match the HOF chain exactly") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)), // 11.0
      (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)), // unequal → null
      (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)), // null elem → null
      (4L, Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]) // empty → 0.0
    ).toDF("id", "a", "b")
    // native expression via the injected SQL function (no rewrite involved)
    rows.createOrReplaceTempView("dot_edges")
    val native = spark.sql("SELECT id, graft_dot(a, b) AS d FROM dot_edges")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // interpreted HOF ground truth, rule disabled via excludedRules
    val prev = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules",
      RewriteHofDotProduct.ruleName)
    val hof = try {
      val df = rows.select($"id", hofDot($"a", $"b").as("d"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"),
        "excludedRules did not disable the rewrite")
      df.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
      case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
    assert(native == hof, s"native=$native hof=$hof")
    assert(native(1L).contains(11.0))
    assert(native(2L).isEmpty)
    assert(native(3L).isEmpty)
    assert(native(4L).contains(0.0))
  }

  test("e1's plan compiles the dot products to the native expression inside codegen") {
    val df = graft.Queries.all("e1_cosine_topk")(spark, "/root/testdata/sf0.001")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), optimized)
    // collect() (not count(), which plans a separate query) executes THIS
    // queryExecution, so AQE finalizes the plan we inspect below
    assert(df.collect().nonEmpty)
    // AQE shows codegen spans only in the FINAL plan (post-run); the
    // simple-string format marks a WholeStageCodegen stage as `*(n)`
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("isFinalPlan=true") && physical.contains("*("), physical)
    graft.Queries.releaseCaches(spark)
  }

  test("native expression vs interpreted HOF throughput (informational)") {
    val s = spark
    import s.implicits._
    val n = 50000
    val rng = new scala.util.Random(31)
    val rows = (0 until n).map { i =>
      (i.toLong, Seq.fill(64)(rng.nextDouble()), Seq.fill(64)(rng.nextDouble()))
    }.toDF("id", "a", "b").repartition(4).persist()
    rows.count()
    def run(): Double = {
      val t0 = System.nanoTime()
      rows.select(sum(hofDot($"a", $"b"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val tNative = run()
    spark.conf.set("spark.sql.optimizer.excludedRules", RewriteHofDotProduct.ruleName)
    val tHof = try run() finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    info(f"$n%,d dots of 64 dims: native=$tNative%.2fs interpreted-HOF=$tHof%.2fs (${tHof / tNative}%.1f×)")
    rows.unpersist()
    // no timing assertion — this host swings 3×; the hard checks are the
    // bit-equality tests above. Recorded here so every test run shows the
    // current ratio.
    assert(tNative > 0 && tHof > 0)
  }

  test("non-dot HOF aggregates are left untouched") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("id", "a", "b")
    // sum instead of product: must NOT be rewritten
    val other = rows.select(
      aggregate(zip_with($"a", $"b", (x, y) => x + y), lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(other.collect()(0).getDouble(0) == 10.0)
  }
}
