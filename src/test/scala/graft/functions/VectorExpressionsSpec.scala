package graft.functions

import graft.SparkSpec
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-6

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c).as[Double].head()

  private def vec(xs: Float*): org.apache.spark.sql.Column =
    typedlit(xs.toSeq)

  test("dot: hand-computed") {
    assert(math.abs(one(vec_dot(vec(1f, 2f, 3f), vec(4f, 5f, 6f))) - 32.0) < eps)
  }

  test("squared_l2: hand-computed, squared not rooted (Q4)") {
    assert(math.abs(one(squared_l2(vec(1f, 2f), vec(4f, 6f))) - 25.0) < eps)
  }

  test("cosine: identical vectors = 1, orthogonal = 0, zero guard") {
    assert(math.abs(one(cosine_sim(vec(1f, 2f), vec(1f, 2f))) - 1.0) < eps)
    assert(math.abs(one(cosine_sim(vec(1f, 0f), vec(0f, 1f)))) < eps)
    assert(one(cosine_sim(vec(0f, 0f), vec(1f, 2f))) == 0.0)
  }

  test("l2_normalize: unit norm; zero vector passes through") {
    val n = Seq(1).toDF("x")
      .select(vec_norm(l2_normalize(vec(3f, 4f)))).as[Double].head()
    assert(math.abs(n - 1.0) < eps)
    val z = Seq(1).toDF("x")
      .select(l2_normalize(vec(0f, 0f))).as[Seq[Float]].head()
    assert(z == Seq(0f, 0f))
  }

  test("null propagation") {
    val r = Seq(1).toDF("x")
      .select(squared_l2(lit(null).cast(graft.Schemas.vectorType), vec(1f)))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("length mismatch throws") {
    intercept[Exception] { one(vec_dot(vec(1f), vec(1f, 2f))) }
  }

  test("SQL registration works") {
    VectorFunctions.registerAll(spark)
    val d = spark.sql("SELECT squared_l2(array(1.0f,2.0f), array(4.0f,6.0f)) d")
      .as[Double].head()
    assert(math.abs(d - 25.0) < eps)
  }

  private def randVecs(seed: Int, n: Int): Seq[List[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(List.fill(8)(rnd.nextFloat() * 20f - 10f))
  }

  test("properties: squaredL2(a,a)=0, symmetry, dot/cosine identity") {
    randVecs(1, 20).zip(randVecs(2, 20)).foreach { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val row = df.select(
        squared_l2($"a", $"a").as("saa"),
        squared_l2($"a", $"b").as("sab"),
        squared_l2($"b", $"a").as("sba"),
        vec_dot($"a", $"b").as("dab"),
        vec_dot(l2_normalize($"a"), l2_normalize($"b")).as("cos1"),
        cosine_sim($"a", $"b").as("cos2"),
        vec_norm($"a").as("na"),
        vec_norm($"b").as("nb")
      ).head()
      assert(math.abs(row.getDouble(0)) < eps)
      assert(math.abs(row.getDouble(1) - row.getDouble(2)) < eps)
      if (row.getDouble(6) > eps && row.getDouble(7) > eps) {
        assert(math.abs(row.getDouble(4) - row.getDouble(5)) < 1e-4)
      }
      // squaredL2 = |a|^2 + |b|^2 - 2*dot
      val lhs = row.getDouble(1)
      val rhs = row.getDouble(6) * row.getDouble(6) +
        row.getDouble(7) * row.getDouble(7) - 2 * row.getDouble(3)
      assert(math.abs(lhs - rhs) < 1e-3)
    }
  }

  test("normalize idempotence") {
    randVecs(3, 10).filter(_.exists(_ != 0f)).foreach { a =>
      val df = Seq(Tuple1(a)).toDF("a")
      val (once, twice) = df.select(
        l2_normalize($"a").as("n1"),
        l2_normalize(l2_normalize($"a")).as("n2")
      ).as[(Seq[Float], Seq[Float])].head()
      once.zip(twice).foreach { case (x, y) => assert(math.abs(x - y) < 1e-5) }
    }
  }
}
