package graft

import graft.expressions.Md5Expressions
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The native md5 expressions must be bit-identical to the Column-function
  * forms they replace — that equivalence is what keeps the DuckDB oracles
  * valid (the oracle SQL still derives the same values from hex strings). */
class Md5ExprSpec extends SparkSpec {
  import spark.implicits._

  private def legacyInt(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")
  private def legacyLong(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("property: native md5 hashes equal the conv/substring forms on arbitrary strings") {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
    val gen = Gen.listOfN(30, Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.listOfN(6, Gen.oneOf("héllo", "世界", "a b", "", "🚀", "x:y")).map(_.mkString(" "))))
    val r = SCTest.check(params, Prop.forAll(gen) { strs =>
      val df = strs.toDF("s")
      df.select(
          (Md5Expressions.md5Int(col("s")) === legacyInt(col("s"))) &&
          (Md5Expressions.md5Long(col("s")) === legacyLong(col("s"))))
        .as[Boolean].collect().forall(identity)
    })
    assert(r.passed, r.status.toString)
  }

  test("property: md5Words' four 32-bit words equal the conv/substring " +
      "forms at offsets 1/9/17/25 (the bootstrap draw's oracle contract)") {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
    val gen = Gen.listOfN(30, Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.listOfN(4, Gen.oneOf("héllo", "世界", ":boot:0", "", "🚀"))
        .map(_.mkString(" "))))
    def legacyWord(c: org.apache.spark.sql.Column, g: Int) =
      conv(substring(md5(c), 1 + 8 * g, 8), 16, 10).cast("long")
    val r = SCTest.check(params, Prop.forAll(gen) { strs =>
      val df = strs.toDF("s")
      df.select((0 until 4).map(g =>
          Md5Expressions.md5Words(col("s"))(g) === legacyWord(col("s"), g))
          .reduce(_ && _))
        .as[Boolean].collect().forall(identity)
    })
    assert(r.passed, r.status.toString)
  }

  test("property: bootstrapWeights equals the md5Words Column form walked " +
      "through the thresholds (the q_bootstrap_ci draw, kernel vs Columns)") {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
    val ths = graft.operators.Sampling.poissonOneThresholds(8)
    val gen = Gen.listOfN(25, Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr, Gen.posNum[Long].map(_.toString)))
    val r = SCTest.check(params, Prop.forAll(gen) { strs =>
      val df = strs.toDF("s")
      val groups = 3 // 12 slots — exercises every word position
      def columnForm(b: Int) = {
        val u = pmod(Md5Expressions.md5Words(
          concat(col("s"), lit(s":boot:${b / 4}")))(b % 4), lit(1000000L))
        ths.map(t => when(u >= t, 1L).otherwise(0L)).reduce(_ + _)
      }
      val kernel = Md5Expressions.bootstrapWeights(col("s"), "boot", groups, ths)
      df.select((0 until groups * 4).map(b =>
          kernel(b) === columnForm(b)).reduce(_ && _))
        .as[Boolean].collect().forall(identity)
    })
    assert(r.passed, r.status.toString)
  }

  test("native expressions participate in whole-stage codegen outside lambdas") {
    // a range source keeps the project out of ConvertToLocalRelation's reach
    val df = spark.range(4)
      .select(Md5Expressions.md5Int(col("id").cast("string")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), s"project not codegen-fused:\n$plan")
    assert(df.as[Long].collect().forall(v => v >= 0 && v < (1L << 32)))
  }

  test("the SQL function surface evaluates graft_md5int like the Column form") {
    // GraftExtensions injects these builders at session build (the shared
    // test session predates it); registering the same builder directly
    // exercises the identical registry + SQL resolution path
    val s2 = spark.newSession()
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_md5int", args => graft.expressions.Md5Int(args.head), "built-in")
    val got = s2.sql("SELECT graft_md5int('hello')").collect()(0).getLong(0)
    val expected = spark.range(1)
      .select(conv(substring(md5(lit("hello")), 1, 8), 16, 10).cast("long"))
      .collect()(0).getLong(0)
    assert(got == expected)
  }

  test("graft_repetition_stats resolves through its SQL builder with a literal k") {
    val s2 = spark.newSession()
    val (_, builder) = graft.expressions.GraftExtensions.builders("graft_repetition_stats")
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_repetition_stats", args => builder(args), "built-in")
    val r = s2.sql("SELECT graft_repetition_stats('go go go', 2) AS r")
      .selectExpr("r.n_tokens", "r.n_distinct", "r.top_gram", "r.top_count")
      .collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 1 &&
      r.getString(2) == "go go" && r.getLong(3) == 2)
  }

  test("every injected SQL function documents its usage (preconditions included)") {
    val usage = graft.expressions.GraftExtensions.usage
    graft.expressions.GraftExtensions.builders.keys.foreach { name =>
      assert(usage.contains(name) && usage(name).nonEmpty, s"no usage text for $name")
    }
    // the two load-bearing preconditions the type system cannot enforce
    assert(usage("graft_minhash_signature").contains("2^32"))
    assert(usage("graft_shingle_hashes").toLowerCase.contains("normalized"))
  }
}
