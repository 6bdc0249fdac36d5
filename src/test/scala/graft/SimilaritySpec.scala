package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)), // near vec 0
    (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)), // orthogonal to vec 0
    (3L, Seq(0.0f, 0.0f, 1.0f, 0.0f)))

  test("cosine: identical → 1, orthogonal → 0") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f), Seq(-2.0f, 1.0f))).toDF("a", "b", "c")
    val got = df.select(
      Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("c"))).as[(Double, Double)].head()
    assert(math.abs(got._1 - 1.0) < 1e-12 && math.abs(got._2) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine, excludes self, breaks ties by id") {
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(df, df.filter(col("vec_id") === 0),
        "vec_id", "embedding", 2)
      .orderBy("rank").as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._3) == Seq(1L, 2L)) // nearest is vec 1, then the tie (2,3) → id 2
  }

  test("hyperplaneSig: identical vectors share a bucket; sig is deterministic") {
    val df = Seq((0L, Seq(0.5f, -0.5f, 1.0f, 2.0f)), (1L, Seq(0.5f, -0.5f, 1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val sigs = df.select(Similarity.hyperplaneSig(col("embedding"), 4, 8)).as[Long].collect()
    assert(sigs(0) == sigs(1))
    val again = df.select(Similarity.hyperplaneSig(col("embedding"), 4, 8)).as[Long].collect()
    assert(sigs.toSeq == again.toSeq)
  }

  test("lshTopK finds bucket-mates; results are a subset of brute-force pairs") {
    val df = vecs.toDF("vec_id", "embedding")
    val lsh = Similarity.lshTopK(df, df, "vec_id", "embedding", 4, 2, 2)
      .as[(Long, Long, Long)].collect().toSeq
    // with only 2 planes everything near collides; every reported neighbor
    // must at least be a real (non-self) corpus vector
    assert(lsh.nonEmpty)
    assert(lsh.forall { case (q, _, n) => q != n })
  }

  test("ivfTopK searches only probed cells and finds the planted neighbor") {
    // cells are seeded by vecs 0 and 1 (orthogonal); vec 2 ≈ vec 0's cell,
    // vec 3 ≈ vec 1's cell — probing 1 cell must still find the same-cell
    // neighbor and may legitimately miss the cross-cell one
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.95f, 0.05f)), (3L, Seq(0.05f, 0.95f))).toDF("vec_id", "embedding")
    val got = Similarity.ivfTopK(df, df.filter(col("vec_id") === 2),
        Similarity.seedCentroids(df, "vec_id", 2), "vec_id", "embedding", 1, 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L, 0L))) // nearest in vec 2's own cell is vec 0
  }

  test("cosineDupPairs reports each qualifying pair once with truncated score") {
    val df = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.cosineDupPairs(df, "vec_id", "embedding", 2, 2, 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 1L, 1.0)))
  }
}
