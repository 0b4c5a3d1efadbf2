package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp rolling window hashes — the kernel behind
  * [[graft.ext.SubstrDedup]]'s corpus scan (the upgrade path its round-5
  * doc named). The naive form hashes `substr(text, pos+1, k)` per
  * position: O(k) work AND a k-char string allocation for every character
  * of the corpus — ~40× the corpus in transient bytes at k = 40. This
  * kernel emits the hash of every stride-1 k-window in ONE pass over the
  * text (polynomial rolling hash over code points, wrapping 64-bit
  * arithmetic), allocating only the output long array.
  *
  * Positions are CODE-POINT ordinals, exactly the unit Spark's
  * `length`/`substr` count, so output positions drop into the same span
  * arithmetic (and the DuckDB mirror) as the substr-based form. The code
  * points are decoded straight off the UTF-8 bytes — no intermediate
  * String.
  *
  * Collision stance: equal windows ALWAYS hash equal (the rolling
  * recurrence is a function of window content alone — pinned by spec
  * against a from-scratch polynomial evaluation); unequal windows can
  * collide, which only inflates the candidate sliver that
  * [[graft.ext.SubstrDedup.dupOccurrences]] re-verifies by window STRING.
  * The hash VALUES differ from `xxhash64(substr(…))` by design — the
  * operator's contract is span output, not intermediate hashes.
  */
object RollingHash {

  /** Polynomial base: odd 64-bit constant (the FNV-1a prime); mod 2^64 is
    * the JVM's wrapping long arithmetic.
    */
  final val B = 0x100000001b3L

  /** All stride-1 k-window hashes of `s` as code-point windows:
    * `out(i) = Σ_j cp(i+j) · B^(k-1-j) (mod 2^64)` for i in
    * `[0, numCodePoints - k]`; fewer than k code points → empty array.
    */
  def windowHashes(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // decode code points once; worst case one per byte
    var cps = new Array[Int](math.min(nb, 16))
    var n = 0
    var i = 0
    while (i < nb) {
      val b0 = bytes(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if ((b0 & 0xE0) == 0xC0) {
        cp = ((b0 & 0x1F) << 6) | (bytes(i + 1) & 0x3F); len = 2
      } else if ((b0 & 0xF0) == 0xE0) {
        cp = ((b0 & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) |
          (bytes(i + 2) & 0x3F); len = 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
          ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F); len = 4
      }
      if (n == cps.length) cps = java.util.Arrays.copyOf(cps, n * 2)
      cps(n) = cp
      n += 1
      i += len
    }
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    // B^(k-1) mod 2^64, for sliding the leading code point out
    var bk = 1L
    i = 1
    while (i < k) { bk *= B; i += 1 }
    val out = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + cps(i); i += 1 }
    out(0) = h
    i = 1
    while (i < m) {
      h = (h - cps(i - 1) * bk) * B + cps(i + k - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `rolling_window_hashes(text, k)` — one 64-bit hash per stride-1
  * k-code-point window.
  */
case class RollingWindowHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"rolling_window_hashes: k must be >= 1, got $k")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_window_hashes"
  override protected def nullSafeEval(input: Any): Any =
    RollingHash.windowHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.windowHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): RollingWindowHashes =
    copy(child = newChild)
}
