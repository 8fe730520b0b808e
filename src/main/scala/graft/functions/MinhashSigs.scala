package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the full MinHash signature vector of a
  * token array in ONE pass — the production path behind
  * [[graft.operators.Dedup.minhashSigFromToks]].
  *
  * Semantics are BIT-IDENTICAL to the declarative form (which the DuckDB
  * oracle replays): signature 2j is the minimum over tokens of the first
  * 16 hex chars of md5("j:" ‖ token), signature 2j+1 the minimum of the
  * last 16. Lowercase-hex lexicographic order on fixed-length strings is
  * exactly unsigned byte order of the digest half, so the mins are
  * tracked as UNSIGNED LONG compares and hex-encoded once at the end —
  * never materializing per-token hex strings at all.
  *
  * Why native instead of `array_min(transform(...))`: higher-order
  * functions are CodegenFallback and interpret their lambda per element
  * with no subexpression reuse, and Spark's `md5` looks up a fresh
  * MessageDigest per call. For a w-wide signature that is w interpreted
  * array walks and w/2 digests per token per row. This expression walks
  * the token array once, reuses one thread-local digest instance, and
  * allocates only the 16-byte digest per (token, j) — at 100 TB the
  * signature pass stays CPU-bound on raw MD5 throughput instead of
  * expression-interpreter overhead (measured 5.05 s → sub-second on the
  * sf0.1 fixture's l2_minhash).
  *
  * Null/empty contract matches the declarative form: null input → null
  * output; empty (or all-null) token array → an array of null
  * signatures (array_min of an empty transform is null); null tokens
  * are skipped (array_min skips nulls).
  */
case class MinhashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  private val nPairs = (numHashes + 1) / 2

  // "j:" prefixes, precomputed once per (deserialized) expression instance
  @transient private lazy val prefixes: Array[Array[Byte]] =
    (0 until nPairs).map(j => (j.toString + ":").getBytes(UTF_8)).toArray

  // MessageDigest is stateful and not thread-safe; expression instances
  // can be shared across an executor's task threads, so the reused
  // instance is thread-local
  @transient private lazy val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private def beLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex16(v: Long): UTF8String = {
    val out = new Array[Byte](16)
    var i = 0
    while (i < 16) {
      out(i) = hexDigits(((v >>> ((15 - i) * 4)) & 0xfL).toInt).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val md = mdLocal.get()
    // unsigned mins, initialized to the unsigned maximum
    val minHi = Array.fill(nPairs)(-1L)
    val minLo = Array.fill(nPairs)(-1L)
    var any = false
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        any = true
        val tokBytes = toks.getUTF8String(t).getBytes
        var j = 0
        while (j < nPairs) {
          md.reset()
          md.update(prefixes(j))
          md.update(tokBytes)
          val d = md.digest()
          val hi = beLong(d, 0)
          val lo = beLong(d, 8)
          if (java.lang.Long.compareUnsigned(hi, minHi(j)) < 0) minHi(j) = hi
          if (java.lang.Long.compareUnsigned(lo, minLo(j)) < 0) minLo(j) = lo
          j += 1
        }
      }
      t += 1
    }
    val out = new Array[Any](numHashes)
    if (any) {
      var i = 0
      while (i < numHashes) {
        out(i) = hex16(if (i % 2 == 0) minHi(i / 2) else minLo(i / 2))
        i += 1
      }
    } // else: all-null signature array, like array_min over an empty array
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[MinhashSigs]] as a Column (direct construction, no registry). */
object MinhashSigsCol {
  def apply(toks: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinhashSigs(ColumnBridge.expression(toks), numHashes))
  }
}

/** Native one-pass twin of the PRODUCTION xxhash64 signature family
  * ([[graft.operators.Dedup.minhashSigFastFromToks]]): signature lane i
  * is the min over tokens of `xxhash64(i, token)` — BIT-IDENTICAL to the
  * declarative `array_min(transform(toks, t => xxhash64(lit(i), t)))`
  * form, which PropertiesSpec pins elementwise. Why native: the HOF form
  * is CodegenFallback and walks the token array once PER LANE with
  * per-element lambda interpretation — w interpreted walks per row; this
  * walks it once total, with the int-literal fold precomputed per lane
  * (xxhash64 folds children left-to-right, so `xxhash64(lit(i), t)` ==
  * `hashUTF8String(t, hashInt(i, 42))`) and no allocation beyond the
  * output vector. Null contract matches the built-in exactly: a null
  * token contributes the lane seed itself (XxHash64 ignores null
  * children, leaving the fold at the seed), an empty token array yields
  * all-null lanes (array_min of an empty array), a null array yields
  * null. Mins are SIGNED compares — array_min's LongType ordering.
  */
case class MinhashSigsFast(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs_fast expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs_fast"

  // the xxhash64(lit(i), tok) fold starts at seed 42 and folds the int
  // literal first — a constant per lane, precomputed once per instance
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val out = new Array[Any](numHashes)
    if (n == 0) return new GenericArrayData(out) // all-null lanes
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    while (t < n) {
      if (toks.isNullAt(t)) {
        var i = 0
        while (i < numHashes) {
          if (seeds(i) < mins(i)) mins(i) = seeds(i)
          i += 1
        }
      } else {
        val s = toks.getUTF8String(t)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashUTF8String(s, seeds(i))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      t += 1
    }
    var i = 0
    while (i < numHashes) { out(i) = mins(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[MinhashSigsFast]] as a Column (direct construction, no registry). */
object MinhashSigsFastCol {
  def apply(toks: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinhashSigsFast(ColumnBridge.expression(toks), numHashes))
  }
}
