package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{PandasTitle, Sketches}
import graft.ops.Normalize

/** Property-based invariants (SURVEY.md §5.3) for the pure operator kernels.
  * Spark-level properties (dedup idempotence etc.) live in DedupProps below
  * with a shared session and tiny generated frames.
  */
object NormalizeProps extends Properties("Normalize") {

  property("normalizeName is idempotent") = forAll { (s: String) =>
    val once = Normalize.normalizeName(s)
    Normalize.normalizeName(once) == once
  }

  property("normalizeName output has no spaces or uppercase") = forAll { (s: String) =>
    val n = Normalize.normalizeName(s)
    !n.contains(' ') && n == n.toLowerCase
  }

  // idempotence holds where no one-to-many case expansion occurs; CPython
  // itself is non-idempotent on expansions ('aİb'.title() == 'Ai̇b', but
  // 'Ai̇b'.title() == 'Ai̇B') and parity means matching that — so the
  // property is checked over ASCII, and the expansion cases are pinned
  // against CPython outputs in OpsSpec.
  private val asciiGen = Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)

  property("pandas_title is idempotent (ASCII)") = forAll(asciiGen) { (s: String) =>
    val once = PandasTitle.title(UTF8String.fromString(s)).toString
    PandasTitle.title(UTF8String.fromString(once)).toString == once
  }

  property("pandas_title preserves length and non-letters (ASCII)") =
    forAll(asciiGen) { (s: String) =>
      val t = PandasTitle.title(UTF8String.fromString(s)).toString
      // codepoint count preserved; every non-letter codepoint unchanged
      // (only within ASCII — full Unicode has one-to-many expansions)
      val a = s.codePoints.toArray; val b = t.codePoints.toArray
      a.length == b.length && a.indices.forall { i =>
        Character.isLetter(a(i)) || a(i) == b(i)
      }
    }

  private val tokenGen = Gen.listOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))

  property("minhash merge == signature lower bound (element-wise)") =
    forAll(tokenGen, tokenGen) { (ta, tb) =>
      def sig(tokens: List[String]): Array[Long] = {
        val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          tokens.map(t => UTF8String.fromString(t)).toArray[Any])
        val sh = Sketches.shingleHashes(arr, 1)
        Sketches.minHashSignature(sh, 16).toLongArray()
      }
      val merged = sig(ta).zip(sig(tb)).map { case (x, y) => math.min(x, y) }
      val union = sig(ta ++ tb)
      // k=1 shingles: shingle set of concat == union of shingle sets
      Prop(merged.sameElements(union)) :| "merge must equal union signature"
    }

  property("simhash of identical token lists is equal; empty is 0") =
    forAll(tokenGen) { ts =>
      def arr(l: List[String]) = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        l.map(t => UTF8String.fromString(t)).toArray[Any])
      Sketches.simhash64(arr(ts)) == Sketches.simhash64(arr(ts)) &&
        Sketches.simhash64(arr(Nil)) == 0L
    }
}

object VectorProps extends Properties("Vectors") {
  import graft.functions.Vectors
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  // integer-valued doubles: keeps sums away from subnormal sign-flip edges
  private val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-100, 100).map(_.toDouble))
  private def arr(v: List[Double]) = new GenericArrayData(v.toArray[Any])

  property("dot == explicit left fold over the common prefix") =
    forAll(vecGen, vecGen) { (a, b) =>
      val n = math.min(a.size, b.size)
      Vectors.dot(arr(a), arr(b)) ==
        (0 until n).foldLeft(0.0)((s, i) => s + a(i) * b(i))
    }

  // equal-length pairs: the production shape (the expression layer NULLs
  // mismatches before the kernel runs)
  private val pairGen = for {
    n <- Gen.chooseNum(1, 64)
    a <- Gen.listOfN(n, Gen.chooseNum(-100, 100).map(_.toDouble))
    b <- Gen.listOfN(n, Gen.chooseNum(-100, 100).map(_.toDouble))
  } yield (a, b)

  property("dot on equal-length pairs == explicit left fold") =
    forAll(pairGen) { case (a, b) =>
      Vectors.dot(arr(a), arr(b)) ==
        a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    }

  property("DotProduct expression: length mismatch evaluates to NULL") =
    forAll(vecGen, vecGen) { (a, b) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      val expr = graft.functions.DotProduct(
        Literal.create(a.toArray, ArrayType(DoubleType)),
        Literal.create(b.toArray, ArrayType(DoubleType)))
      val got = expr.eval(null)
      if (a.size != b.size) got == null
      else got == a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    }

  property("hyperplane sketch is invariant under positive scaling") =
    forAll(vecGen, Gen.chooseNum(1, 1000)) { (v, c) =>
      Vectors.hyperplaneSketch(arr(v), 7L, 16) ==
        Vectors.hyperplaneSketch(arr(v.map(_ * c)), 7L, 16)
    }

  property("distinct seeds give independent families (some vector separates them)") =
    Prop(Vectors.hyperplaneSketch(arr(List(1.0, 2.0, 3.0, -4.0)), 1L, 16) !=
      Vectors.hyperplaneSketch(arr(List(1.0, 2.0, 3.0, -4.0)), 2L, 16))
}

object TopKProps extends Properties("TopKAgg") {
  private val entryGen = Gen.listOf(
    Gen.zip(Gen.chooseNum(0, 20).map(_.toDouble), Gen.chooseNum(0L, 50L)))

  property("fold over any input order == global sort-take") =
    forAll(entryGen, Gen.chooseNum(1, 6)) { (xs, k) =>
      val agg = new graft.ext.TopKAgg(k)
      val got = xs.foldLeft(agg.zero)(agg.reduce)
      val want = xs.sortBy(e => (-e._1, e._2)).take(k)
      got == want
    }

  property("merge of split sketches == sketch of concatenation") =
    forAll(entryGen, entryGen, Gen.chooseNum(1, 5)) { (a, b, k) =>
      val agg = new graft.ext.TopKAgg(k)
      val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      merged == (a ++ b).sortBy(e => (-e._1, e._2)).take(k)
    }
}

object HeavyHitterProps extends Properties("HeavyHittersAgg") {
  // small alphabet so items actually cross the n/(k+1) threshold
  private val streamGen = Gen.listOf(Gen.oneOf("a", "a", "a", "b", "b", "c", "d", "e"))

  property("every item above n/(k+1) is present, counts never overcount") =
    forAll(streamGen, Gen.chooseNum(2, 6)) { (xs, k) =>
      val agg = new graft.ext.HeavyHittersAgg(k)
      val sketch = xs.foldLeft(agg.zero)(agg.reduce)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val slack = xs.size.toDouble / (k + 1)
      exact.forall { case (item, n) =>
        (n <= slack || sketch.contains(item)) &&
          sketch.getOrElse(item, 0L) <= n
      }
    }
}

/** Spark-level properties on tiny generated frames (bounded case count —
  * each case is a real local job).
  */
class DedupProps extends graft.SparkSpec {
  import org.scalacheck.Prop
  import graft.ops.Dedup

  test("dropDuplicates: |out| <= |in|, idempotent, set-equal to distinct (sampled)") {
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 3)))
    val prop = forAll(gen) { rows =>
      val df = rows.toDF("a", "b")
      val d1 = Dedup.distinctAll(df)
      val n1 = d1.count()
      Prop(n1 <= rows.size &&
        Dedup.distinctAll(d1).count() == n1 &&
        n1 == rows.distinct.size)
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }
}
