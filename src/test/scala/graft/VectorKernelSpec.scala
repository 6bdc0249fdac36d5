package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The native vector kernels (DotFold / HyperplaneSigExpr) must be
  * bit-identical to the interpreted aggregate/zip_with Column forms they
  * replace — IEEE doubles folded in the same order, so cosine scores, LSH
  * buckets and ranks keep hash-matching the DuckDB list_reduce oracles. */
class VectorKernelSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64

  test("dot kernel equals the Column form on real embeddings (exact doubles)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = emb.select(col("vec_id").as("ida"), col("embedding").as("a"))
      .join(emb.select(col("vec_id").as("idb"), col("embedding").as("b")),
        col("ida") === col("idb") + 1)
    val bad = pairs.select(
        (Similarity.dot(col("a"), col("b")) <=>
          Similarity.dotColumnForm(col("a"), col("b"))).as("ok"))
      .filter(not(col("ok"))).count()
    assert(bad == 0, s"$bad dot products diverge from the Column form")
    assert(pairs.count() > 0)
  }

  test("dot kernel nulls on length mismatch and null elements, like zip_with") {
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),          // ok
      (Seq(1.0f, 2.0f), Seq(3.0f)),                 // length mismatch
      (Seq.empty[Float], Seq.empty[Float])).toDF("a", "b")
    val rows = df.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotColumnForm(col("a"), col("b")).as("legacy"))
    val bad = rows.filter(not(col("native") <=> col("legacy"))).count()
    assert(bad == 0)
    val vals = rows.collect()
    assert(vals(0).getDouble(0) == 11.0)
    assert(vals(1).isNullAt(0))
    assert(vals(2).getDouble(0) == 0.0)
  }

  test("hyperplane-sig kernel equals the Column form across plane families") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    for (offset <- Seq(0, 8)) {
      val bad = emb.select(
          (Similarity.hyperplaneSig(col("embedding"), dims, 8, offset) <=>
            Similarity.hyperplaneSigColumnForm(col("embedding"), dims, 8, offset)).as("ok"))
        .filter(not(col("ok"))).count()
      assert(bad == 0, s"offset=$offset buckets diverge from the Column form")
    }
  }

  test("cosine via kernels stays inside whole-stage codegen") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val df = emb.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"),
      Similarity.hyperplaneSig(col("embedding"), dims, 8).as("sig"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"vector kernels not codegen-fused:\n$plan")
    // self-cosine is 1 up to rounding (x/(√x·√x) is not exactly 1 in IEEE)
    assert(df.filter(abs(col("c") - 1.0d) > 1e-12 && col("c").isNotNull).count() == 0)
  }
}
