package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Fused MinHash signature straight from the TOKEN array: w-gram shingle
  * hashes and all k hash-family minima in ONE code-generated pass.
  *
  * Replaces the round-1 string pipeline (build w-gram strings with
  * concat_ws → array_distinct → xxhash64 each → explode → k min-aggregates)
  * whose cost was dominated by per-shingle string construction and a
  * |docs|×|shingles|-row shuffle used purely as an optimizer barrier.
  * Here a shingle's hash is an XXH64 chain over the w token hashes — no
  * intermediate strings exist, and no shuffle happens. Duplicate shingles
  * need no dedup: `min` is idempotent, so multiset and set minima agree
  * (the old form deduped only to shrink the explode).
  *
  * Hash structure (seeds match the Spark builtins used in round 1):
  *   token t_j   → XXH64.hashUTF8String(t_j, 42)            (= xxhash64(t_j))
  *   shingle p   → fold XXH64.hashLong over w token hashes, seed 42
  *   family i    → murmur3_int(i, murmur3_long(shingleHash, 42))
  *                                                  (= Spark hash(h, i))
  *   sig[i]      → min over shingles
  * Docs shorter than w tokens produce ONE whole-doc shingle, mirroring
  * Dedup.shingles' fallback.
  */
case class ShingleMinHash(child: Expression, w: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case dt =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_minhash expects array<string> tokens, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val th = new Array[Long](n)
    var j = 0
    while (j < n) { th(j) = XXH64.hashUTF8String(v.getUTF8String(j), 42L); j += 1 }
    val sig = Array.fill(k)(Int.MaxValue)
    val nShingles = if (n < w) 1 else n - w + 1
    val width = if (n < w) n else w
    var p = 0
    while (p < nShingles) {
      var acc = 42L
      var q = 0
      while (q < width) { acc = XXH64.hashLong(th(p + q), acc); q += 1 }
      val h1 = Murmur3_x86_32.hashLong(acc, 42)
      var i = 0
      while (i < k) {
        val m = Murmur3_x86_32.hashInt(i, h1)
        if (m < sig(i)) sig(i) = m
        i += 1
      }
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val mur = "org.apache.spark.unsafe.hash.Murmur3_x86_32"
      val n = ctx.freshName("n"); val th = ctx.freshName("th")
      val sig = ctx.freshName("sig"); val j = ctx.freshName("j")
      val p = ctx.freshName("p"); val q = ctx.freshName("q")
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val h1 = ctx.freshName("h1"); val m = ctx.freshName("m")
      val nSh = ctx.freshName("nSh"); val width = ctx.freshName("width")
      s"""
         |int $n = $v.numElements();
         |long[] $th = new long[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  $th[$j] = $xxh.hashUTF8String($v.getUTF8String($j), 42L);
         |}
         |int[] $sig = new int[$k];
         |java.util.Arrays.fill($sig, Integer.MAX_VALUE);
         |int $nSh = ($n < $w) ? 1 : $n - $w + 1;
         |int $width = ($n < $w) ? $n : $w;
         |for (int $p = 0; $p < $nSh; $p++) {
         |  long $acc = 42L;
         |  for (int $q = 0; $q < $width; $q++) {
         |    $acc = $xxh.hashLong($th[$p + $q], $acc);
         |  }
         |  int $h1 = $mur.hashLong($acc, 42);
         |  for (int $i = 0; $i < $k; $i++) {
         |    int $m = $mur.hashInt($i, $h1);
         |    if ($m < $sig[$i]) $sig[$i] = $m;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

/** Fused 64-bit SimHash (Charikar 2002) straight from the token array: one
  * pass over the tokens with all 64 majority-vote counters in registers.
  *
  * Replaces the composed form (64 separate `aggregate()` lambdas, each
  * re-traversing the token-hash array — and invariance probes evaluating 4
  * simhashes per row paid 256 traversals). Bit-identical to it: a token's
  * vote for bit i is +1 if bit i of xxhash64(token, 42) is set else −1;
  * output bit i is set iff the vote sum is > 0.
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case dt =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects array<string> tokens, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val cnt = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = XXH64.hashUTF8String(v.getUTF8String(j), 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) cnt(i) += 1 else cnt(i) -= 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (cnt(i) > 0) out |= (1L << i); i += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val n = ctx.freshName("n"); val cnt = ctx.freshName("cnt")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |int[] $cnt = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $xxh.hashUTF8String($v.getUTF8String($j), 42L);
         |  for (int $i = 0; $i < 64; $i++) {
         |    if ((($h >>> $i) & 1L) == 1L) $cnt[$i]++; else $cnt[$i]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($cnt[$i] > 0) $out |= (1L << $i);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

object TextExpressions {
  /** Column wrapper: fused tokens → w-gram shingles → k-family MinHash
    * signature, one codegen pass, no intermediate strings. */
  def shingle_minhash(tokens: Column, w: Int, k: Int): Column =
    ColumnShim.column(ShingleMinHash(ColumnShim.expression(tokens), w, k))

  /** Column wrapper: fused tokens → 64-bit SimHash, one pass, counters in
    * registers. */
  def simhash64(tokens: Column): Column =
    ColumnShim.column(Simhash64(ColumnShim.expression(tokens)))
}
