package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch expressions for the dedup family.
  *
  * Rationale (measured at sf0.1, 5000 docs): the pure-SQL higher-order
  * formulations (`transform(sequence(0,127), i -> array_min(zip_with(...)))`)
  * allocate an intermediate array per seed per row — ~192M element
  * allocations — and ran ~10 s; these expressions do the same math in tight
  * primitive loops with zero per-seed allocation, ~100× less garbage.
  * Hashing uses Spark's own xxhash64 kernel (`XxHash64Function`) so values
  * stay consistent with the SQL `xxhash64` function family.
  *
  * All three implement `doGenCode` by static-method delegation, so they
  * stay inside whole-stage codegen spans.
  */
object Sketches {
  private val GOLDEN = 0x9E3779B97F4A7C15L

  /** Murmur-style 64-bit finalizer — the second hash of the double-hashing
    * minhash family (h_i = h1 + i*h2), derived from h1 with full avalanche.
    */
  def mix64(zIn: Long): Long = {
    var z = zIn + GOLDEN
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def hashToken(t: UTF8String): Long = XxHash64Function.hash(t, StringType, 42L)

  /** Sorted distinct hashes of word k-shingles. Shingle identity is the
    * polynomial combination of consecutive token hashes — no shingle string
    * is ever materialized (hash-set semantics are what MinHash/Jaccard need;
    * the ~2^-40 collision rate at corpus scale is noise).
    */
  def shingleHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val tok = new Array[Long](n)
    var i = 0
    while (i < n) { tok(i) = hashToken(tokens.getUTF8String(i)); i += 1 }
    val m = math.max(n - k + 1, 0)
    val set = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i < m) {
      var h = 1125899906842597L
      var j = 0
      while (j < k) { h = h * 31 + tok(i + j); j += 1 }
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** MinHash signature over pre-hashed shingles: sig_i = min_s (s + i*mix(s)). */
  def minHashSignature(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h1 = shingles.getLong(j)
      val h2 = mix64(h1)
      var i = 0
      var v = h1
      while (i < numHashes) {
        if (v < mins(i)) mins(i) = v
        v += h2
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash of a token array (hashes computed inline, one pass). */
  def simhash64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hashToken(tokens.getUTF8String(j))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }
}

/** `shingle_hashes(tokens, k)` — sorted distinct k-shingle hashes. */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.shingleHashes(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.shingleHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `minhash_signature(shingleHashes, h)` — h-value minhash signature. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.minHashSignature(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.minHashSignature($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `simhash64(tokens)` — 64-bit SimHash. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    Sketches.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sketches.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
