package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the codegen'd kernels against straightforward
  * Scala reference implementations — randomized inputs with a fixed seed
  * (same deterministic-sampling shape as DslPropertySpec). */
class KernelPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1234L + i)))

  private val longArray: Gen[Array[Long]] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Long.MinValue, Long.MaxValue)).map(_.toArray))

  test("jaccardLongKernel equals the set-based reference on random arrays") {
    for ((a, b) <- samples(Gen.zip(longArray, longArray), 200)) {
      val da = a.distinct; val db = b.distinct
      val expected =
        if (da.isEmpty && db.isEmpty) 1.0
        else {
          val inter = da.toSet.intersect(db.toSet).size
          inter.toDouble / (da.length + db.length - inter)
        }
      val got = ArrayFns.jaccardLongKernel(
        new GenericArrayData(da), new GenericArrayData(db))
      assert(got == expected, s"jaccard mismatch on ${da.toSeq} vs ${db.toSeq}")
    }
  }

  test("JaccardThresholdExpr returns the value iff >= threshold, else null") {
    for ((a, b) <- samples(Gen.zip(longArray, longArray), 100)) {
      val da = new GenericArrayData(a.distinct)
      val db = new GenericArrayData(b.distinct)
      val j = ArrayFns.jaccardLongKernel(da, db)
      for (theta <- Seq(0.0, j - 0.01, j, j + 0.01, 1.0)) {
        val e = JaccardThresholdExpr(null, null, theta)
        val got = e.nullSafeEval(da, db)
        if (j >= theta) assert(got == j) else assert(got == null)
      }
    }
  }

  test("simhash64 low 32 bits equal simhash32 (identical per-bit votes)") {
    for (hs <- samples(longArray, 200)) {
      val arr = new GenericArrayData(hs)
      val s32 = ArrayFns.simhash32Kernel(arr)
      val s64 = ArrayFns.simhash64Kernel(arr)
      assert((s64 & 0xffffffffL) == s32,
        s"low-bit divergence on ${hs.toSeq}")
    }
  }

  test("PqEncodeExpr equals the brute-force argmin reference") {
    val m = 4; val kc = 5; val subDim = 3
    val vecGen = Gen.listOfN(m * subDim, Gen.chooseNum(-5.0, 5.0)).map(_.toArray)
    val flatGen = Gen.listOfN(m * kc * subDim, Gen.chooseNum(-5.0, 5.0))
    for ((v, flat) <- samples(Gen.zip(vecGen, flatGen), 100)) {
      val expr = PqEncodeExpr(null, m, kc, subDim, flat)
      val got = expr.encode(new GenericArrayData(v)).toIntArray().toSeq
      val cents = flat.toArray
      val expected = (0 until m).map { s =>
        val sub = v.slice(s * subDim, (s + 1) * subDim)
        (0 until kc).minBy { c =>
          val cent = cents.slice((s * kc + c) * subDim, (s * kc + c + 1) * subDim)
          val dot = sub.zip(cent).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
          val csq = cent.foldLeft(0.0)((acc, x) => acc + x * x)
          (-2.0 * dot + csq, c)
        }
      }
      assert(got == expected, s"pq code mismatch on ${v.toSeq}")
    }
  }

  test("dotDKernel equals the left-fold reference including order sensitivity") {
    // EQUAL lengths only: the kernel contract is equal-length inputs
    // (DotDExpr nulls a mismatch before the kernel runs — r14, matching
    // the composed zip_with/aggregate form)
    val pairGen = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.zip(Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6)).map(_.toArray),
        Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6)).map(_.toArray)))
    for ((a, b) <- samples(pairGen, 200)) {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      val got = ArrayFns.dotDKernel(new GenericArrayData(a), new GenericArrayData(b))
      assert(java.lang.Double.compare(got, acc) == 0)
    }
  }
}
