package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks over the raw kernels (no SparkSession — these
  * run the same JVM code the codegen'd expressions call). Properties
  * chosen are the ones the operators LEAN on: metric axioms for the
  * k-NN orderings, the winnowing guarantee the fingerprint dedup
  * depends on, PQ encode/ADC consistency, and minhash set-signature
  * laws. Cases are drawn with ScalaCheck generators under FIXED seeds
  * (deterministic — no scalatestplus bridge in the offline cache).
  */
class KernelPropertySpec extends AnyFunSuite {

  private val params = Gen.Parameters.default
  private def cases[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).map(i => g.pureApply(params, Seed(i.toLong)))

  private val vecGen: Gen[Array[Float]] = for {
    n <- Gen.choose(1, 24)
    xs <- Gen.listOfN(n, Gen.chooseNum(-100f, 100f))
  } yield xs.toArray

  private def ad(v: Array[Float]) = new GenericArrayData(v)

  test("squared L2 is a symmetric, non-negative, identity-respecting form") {
    val pairGen = for {
      n <- Gen.choose(1, 24)
      a <- Gen.listOfN(n, Gen.chooseNum(-100f, 100f)).map(_.toArray)
      b <- Gen.listOfN(n, Gen.chooseNum(-100f, 100f)).map(_.toArray)
    } yield (a, b)
    for ((a, b) <- cases(pairGen)) {
      val d1 = VectorOps.squaredL2(ad(a), ad(b), true, true)
      val d2 = VectorOps.squaredL2(ad(b), ad(a), true, true)
      assert(d1 == d2 && d1 >= 0.0)
      assert(VectorOps.squaredL2(ad(a), ad(a), true, true) == 0.0)
    }
  }

  test("dot is consistent with the norm") {
    for (a <- cases(vecGen)) {
      val n = VectorOps.norm(ad(a), true)
      val selfDot = VectorOps.dot(ad(a), ad(a), true, true)
      assert(math.abs(n * n - selfDot) <= 1e-6 * math.max(1.0, selfDot))
    }
  }

  test("l2Normalize yields unit norm for non-zero vectors and fixes " +
      "zero vectors") {
    for (a <- cases(vecGen) :+ Array.fill(5)(0f)) {
      val normed = VectorOps.l2Normalize(ad(a), true).toFloatArray()
      if (VectorOps.norm(ad(a), true) == 0.0) assert(normed.sameElements(a))
      else assert(math.abs(VectorOps.norm(ad(normed), true) - 1.0) < 1e-4)
    }
  }

  test("nearestCentroid returns the argmin the distances imply, lowest " +
      "index on ties") {
    val caseGen = for {
      dim <- Gen.choose(1, 8)
      k <- Gen.choose(1, 6)
      cs <- Gen.listOfN(k,
        Gen.listOfN(dim, Gen.chooseNum(-50f, 50f)).map(_.toArray))
      v <- Gen.listOfN(dim, Gen.chooseNum(-50f, 50f)).map(_.toArray)
    } yield (cs.toArray, v)
    for ((cs, v) <- cases(caseGen)) {
      val got = VectorOps.nearestCentroid(ad(v), true, cs)
      val dists = cs.map(c => VectorOps.squaredL2Floats(v, c))
      assert(dists(got) == dists.min)
      assert(dists.indexOf(dists.min) == got)
    }
  }

  test("PQ encode/ADC consistency: ADC distance equals the sum of " +
      "per-subspace distances to the CHOSEN centroids, which are argmins") {
    val caseGen = for {
      m <- Gen.choose(1, 4)
      subDim <- Gen.choose(1, 4)
      k <- Gen.choose(2, 8)
      books <- Gen.listOfN(m, Gen.listOfN(k,
        Gen.listOfN(subDim, Gen.chooseNum(-10f, 10f)).map(_.toArray))
        .map(_.toArray))
      v <- Gen.listOfN(m * subDim, Gen.chooseNum(-10f, 10f)).map(_.toArray)
      q <- Gen.listOfN(m * subDim, Gen.chooseNum(-10f, 10f)).map(_.toArray)
    } yield (books.toArray, v, q)
    for ((books, v, q) <- cases(caseGen)) {
      val code = VectorOps.pqEncode(ad(v), true, books)
      val table = graft.operators.PqIndex.adcTable(books, q)
      val adc = VectorOps.pqAdc(code, table, books(0).length)
      val subDim = books(0)(0).length
      val expected = books.indices.map { s =>
        val cent = books(s)(code(s) & 0xFF)
        (0 until subDim).map { i =>
          val d = q(s * subDim + i).toDouble - cent(i)
          d * d
        }.sum
      }.sum
      assert(math.abs(adc - expected) < 1e-9)
      for (s <- books.indices) {
        val sub = java.util.Arrays.copyOfRange(v, s * subDim,
          (s + 1) * subDim)
        val dists = books(s).map(c => VectorOps.squaredL2Floats(sub, c))
        assert(dists(code(s) & 0xFF) == dists.min)
      }
    }
  }

  test("winnowing guarantee: documents sharing a window-long substring " +
      "share a fingerprint") {
    // k = 9, window = 4 → any common substring of length k + w - 1 = 12
    // guarantees at least one common selected fingerprint
    val textGen = Gen.listOfN(30, Gen.alphaLowerChar).map(_.mkString)
    val sharedGen = Gen.listOfN(12, Gen.alphaLowerChar).map(_.mkString)
    val caseGen = Gen.zip(textGen, textGen, sharedGen)
    for ((a, b, shared) <- cases(caseGen)) {
      val fa = TextOps.fingerprints(
        UTF8String.fromString(a + shared), 9, 4).toLongArray().toSet
      val fb = TextOps.fingerprints(
        UTF8String.fromString(shared + b), 9, 4).toLongArray().toSet
      assert((fa & fb).nonEmpty,
        s"no shared fingerprint for common 12-gram '$shared'")
    }
  }

  test("minhash signatures are permutation-invariant over shingle sets " +
      "and element-wise monotone under union") {
    val shinglesGen = Gen.nonEmptyListOf(
      Gen.listOfN(5, Gen.alphaLowerChar).map(_.mkString))
    def sig(ss: Seq[String]): Array[Int] =
      TextOps.minhashSig(new GenericArrayData(
        ss.map(UTF8String.fromString).toArray[Any]), 16).toIntArray()
    for ((xs, ys) <- cases(Gen.zip(shinglesGen, shinglesGen))) {
      // order-independent (it's a set signature) — deterministic
      // permutation: reverse
      assert(sig(xs).sameElements(sig(xs.reverse)))
      // union can only lower each min-hash coordinate
      assert(sig(xs).zip(sig(xs ++ ys)).forall { case (x, u) => u <= x })
    }
  }

  test("simhash near-dup premise: one changed token flips few bits, " +
      "disjoint token sets are uncorrelated") {
    val tokGen = Gen.listOfN(20, Gen.listOfN(6, Gen.alphaLowerChar)
      .map(_.mkString))
    for (toks <- cases(tokGen, 100)) {
      val s1 = TextOps.simhash64(UTF8String.fromString(toks.mkString(" ")))
      val mutated = toks.updated(0, toks.head.reverse + "q")
      val s2 = TextOps.simhash64(
        UTF8String.fromString(mutated.mkString(" ")))
      val hamming = java.lang.Long.bitCount(s1 ^ s2)
      assert(hamming <= 28,
        s"single-token edit moved $hamming of 64 bits")
    }
  }
}
