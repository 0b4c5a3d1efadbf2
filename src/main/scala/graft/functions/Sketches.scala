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

/** The md5-surrogate hash pair of the ORACLE-TWIN sketch family
  * ([[graft.ext.MinHashDedup.signaturesMd5]] /
  * [[graft.ext.SimHash.signaturesMd5]]), computed natively. The twins'
  * DEFINITIONAL form is SQL so DuckDB can mirror it verbatim:
  *
  *   h1 = cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)
  *   h2 = cast(conv(substr(md5(s), 16, 15), 16, 10) as bigint)
  *
  * i.e. the first/second 15 hex nibbles of the digest as 60-bit unsigned
  * ints. Round through the hex STRING, though, and Spark pays md5 → hex
  * encode → substr → conv (a per-char base-16 parse) → decimal-string →
  * bigint, per shingle, plus a struct array per row — measured ~2× the
  * whole signature entry at sf0.1. Nibbles 0–14 of the digest are exactly
  * `(first 8 bytes as big-endian u64) >>> 4` and nibbles 15–29 are
  * `(byte7 & 0xF) << 56 | bytes 8..14`, so these kernels read the digest
  * bytes directly — VALUE-IDENTICAL to the SQL form (pinned in
  * Md5TwinKernelSpec on the corpus fixture + unicode/astral edge cases),
  * with one MessageDigest per thread and zero intermediate arrays.
  * All consumers keep their DuckDB oracles unchanged.
  */
object Md5Twin {
  private val P = 2147483647L // 2^31 − 1, the twins' cross-engine modulus

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5 digest of the string's UTF-8 bytes (what SQL `md5(s)` hashes). */
  private def digest(s: UTF8String): Array[Byte] = {
    val m = mdLocal.get()
    m.reset()
    m.digest(s.getBytes)
  }

  /** Hex nibbles 0–14 of the digest as a 60-bit int (= substr(hex,1,15)). */
  def h1raw(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  /** Hex nibbles 15–29 of the digest as a 60-bit int (= substr(hex,16,15)). */
  def h2raw(d: Array[Byte]): Long = {
    var v = d(7) & 0xFL
    var i = 8
    while (i < 15) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v
  }

  /** The md5-twin MinHash signature in one pass:
    * `sig_i = min_s (h1(s) % P + i·(h2(s) % P)) % P`, i ∈ [0, numHashes) —
    * identical values to the SQL
    * `transform(sequence(0,h−1), i -> array_min(transform(hs, p -> (p.h1 + i*p.h2) % P)))`
    * over `hs = transform(shingles, s -> struct(h1, h2))`, without the
    * per-seed array or the per-shingle struct. Null elements are skipped
    * (array_min semantics); an empty/all-null input yields all-null
    * positions exactly like `array_min` of an empty transform.
    */
  def md5MinhashSigs(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var j = 0
    while (j < n) {
      if (!shingles.isNullAt(j)) {
        any = true
        val d = digest(shingles.getUTF8String(j))
        val a = h1raw(d) % P
        val b = h2raw(d) % P
        var i = 0
        var v = a
        while (i < numHashes) {
          val m = v % P
          if (m < mins(i)) mins(i) = m
          v += b
          i += 1
        }
      }
      j += 1
    }
    if (!any) new GenericArrayData(new Array[Any](numHashes))
    else new GenericArrayData(mins)
  }

  /** The md5-twin 60-bit SimHash in one pass: bit b of the result is set
    * iff `2·|{t : bit b of h1(t) set}| > |tokens|` — identical values to
    * the SQL `aggregate(sequence(0,59), 0L, (acc,b) -> acc + IF(2*size(filter(hs, …)) > size(hs), 1<<b, 0))`
    * over `hs = transform(tokens, t -> h1(t))`, without 60 filter arrays
    * per row. Null elements contribute to the size but never to a bit
    * count (filter-drops-null semantics).
    */
  def md5Simhash60(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](60)
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) {
        val h = h1raw(digest(tokens.getUTF8String(j)))
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (2L * counts(b) > n) sig |= 1L << b
      b += 1
    }
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

/** `md5_minhash_sigs(shingles, h)` — the md5-twin MinHash signature
  * ([[Md5Twin.md5MinhashSigs]]); value-identical to the definitional SQL.
  */
case class Md5MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "md5_minhash_sigs"
  override protected def nullSafeEval(input: Any): Any =
    Md5Twin.md5MinhashSigs(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Twin.md5MinhashSigs($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): Md5MinHashSigs =
    copy(child = newChild)
}

/** `md5_simhash60(tokens)` — the md5-twin 60-bit SimHash
  * ([[Md5Twin.md5Simhash60]]); value-identical to the definitional SQL.
  */
case class Md5SimHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_simhash60"
  override protected def nullSafeEval(input: Any): Any =
    Md5Twin.md5Simhash60(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Twin.md5Simhash60($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5SimHash60 =
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
