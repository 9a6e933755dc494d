package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}
import org.apache.spark.sql.graftshim.ColumnShim

/** Custom Catalyst expression for cosine similarity between two numeric
  * arrays (SURVEY.md §7.4 preference (b): a scalar kernel Spark's built-ins
  * express only as interpreted higher-order `aggregate`/`zip_with` chains —
  * 3 array traversals with per-element lambda dispatch. This is one fused,
  * code-generated loop over the raw ArrayData, which matters when scoring
  * millions of candidate pairs).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double>, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  @inline private def at(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // a dimension mismatch (512-dim vs 768-dim config drift) must fail
    // loud like the PqEncode/AdcScore siblings — silently truncating to
    // the shorter vector scores plausible-but-wrong similarities
    // corpus-wide with no signal
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"cosine_sim: dimension mismatch ${a.numElements()} vs ${b.numElements()}")
    val n = a.numElements()
    val af = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val bf = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = at(a, i, af); val y = at(b, i, bf)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (left.dataType.asInstanceOf[ArrayType].elementType == FloatType)
      "getFloat" else "getDouble"
    val bGet = if (right.dataType.asInstanceOf[ArrayType].elementType == FloatType)
      "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val denom = ctx.freshName("denom")
      s"""
         |if ($a.numElements() != $b.numElements())
         |  throw new IllegalArgumentException("cosine_sim: dimension mismatch "
         |    + $a.numElements() + " vs " + $b.numElements());
         |int $n = $a.numElements();
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $a.$aGet($i);
         |  double y = (double) $b.$bGet($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** All random-hyperplane LSH table signatures of a vector in ONE fused
  * code-generated loop (Charikar 2002 sign-bit LSH).
  *
  * Why native and not `transform`/`aggregate` HOFs: staging the plane
  * projections through a named projection column is not an optimizer
  * barrier — CollapseProject inlines the interpreted HOF into every one of
  * the bitsPerTable×nTables sign-bit references, re-evaluating all plane
  * dot products per reference (measured: dominated q41's 21.6 s bench time
  * at sf0.1). Here the b×L plane projections are one tight loop over the
  * raw ArrayData, emitted once.
  *
  * `planes` is a flattened (nTables*bitsPerTable) × dim row-major constant
  * shipped with the plan (b×L×dim doubles — a few KB).
  * Result: array<int> of length nTables; bit i of element t is
  * sign(v · plane[t*bitsPerTable + i]).
  */
case class LshSignatures(child: Expression, planes: Array[Double],
                         bitsPerTable: Int, nTables: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val dim: Int = planes.length / (bitsPerTable * nTables)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case dt =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lsh_signatures expects array<float|double>, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    // shorter-than-plane vectors must fail loud (PqEncode's posture):
    // projecting a truncated prefix hashes every row into systematically
    // wrong buckets — a corpus-wide silent recall collapse
    if (v.numElements() < dim)
      throw new IllegalArgumentException(
        s"lsh_signatures: input length ${v.numElements()} < $dim (plane dim)")
    val n = dim
    val sigs = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0
      var b = 0
      while (b < bitsPerTable) {
        val base = (t * bitsPerTable + b) * dim
        var proj = 0.0
        var j = 0
        while (j < n) {
          val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
          proj += x * planes(base + j)
          j += 1
        }
        if (proj >= 0) sig |= (1 << b)
        b += 1
      }
      sigs(t) = sig
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (child.dataType.asInstanceOf[ArrayType].elementType == FloatType)
      "getFloat" else "getDouble"
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val sigs = ctx.freshName("sigs"); val n = ctx.freshName("n")
      val t = ctx.freshName("t"); val b = ctx.freshName("b")
      val j = ctx.freshName("j"); val proj = ctx.freshName("proj")
      val sig = ctx.freshName("sig"); val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() < $dim)
         |  throw new IllegalArgumentException("lsh_signatures: input length "
         |    + $v.numElements() + " < $dim (plane dim)");
         |int $n = $dim;
         |int[] $sigs = new int[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  int $sig = 0;
         |  for (int $b = 0; $b < $bitsPerTable; $b++) {
         |    int $base = ($t * $bitsPerTable + $b) * $dim;
         |    double $proj = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $proj += ((double) $v.$get($j)) * $planesRef[$base + $j];
         |    }
         |    if ($proj >= 0) $sig |= (1 << $b);
         |  }
         |  $sigs[$t] = $sig;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignatures =
    copy(child = newChild)
}

/** Exact-integer dot product of two int arrays in ONE fused
  * code-generated loop (long accumulator — bit-identical to the
  * interpreted `zip_with`/`aggregate` composition, which dispatches two
  * lambdas per element across three array traversals). This is q158's
  * per-pair hot kernel: panel×corpus integer dots, the compressed-domain
  * scoring an int8 SIMD engine runs.
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"int8_dot expects array<int>, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // same loud-mismatch posture as cosine_sim: a truncated dot is a
    // plausible-but-wrong score, never a valid computation
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"int8_dot: dimension mismatch ${a.numElements()} vs ${b.numElements()}")
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements())
         |  throw new IllegalArgumentException("int8_dot: dimension mismatch "
         |    + $a.numElements() + " vs " + $b.numElements());
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $a.getInt($i)) * ((long) $b.getInt($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encoder over an int8-quantized vector in ONE fused
  * code-generated loop: for each of `m` subspaces of `dsub` dims, the index
  * of the codebook centroid minimizing exact-integer squared L2 distance
  * (ties to the LOWEST index — deterministic, SQL-reproducible). `codebook`
  * is flattened (m × k × dsub) row-major: centroid j of subspace s starts
  * at (s*k + j)*dsub. All arithmetic is exact long — no float anywhere, so
  * a second engine recomputes every code bit-identically.
  */
case class PqEncode(child: Expression, codebook: Array[Int], m: Int,
                    k: Int, dsub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case dt =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects array<int>, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // corrupt input must fail loud, never encode against the wrong slice
    if (v.numElements() < m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: input length ${v.numElements()} < ${m * dsub} (m*dsub)")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0; var bestD = Long.MaxValue
      var j = 0
      while (j < k) {
        val base = (s * k + j) * dsub
        var d = 0L
        var i = 0
        while (i < dsub) {
          val diff = (v.getInt(s * dsub + i) - codebook(base + i)).toLong
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "int[]")
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes"); val s = ctx.freshName("s")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val base = ctx.freshName("base")
      val diff = ctx.freshName("diff")
      s"""
         |if ($v.numElements() < ${m * dsub})
         |  throw new IllegalArgumentException("pq_encode: input length "
         |    + $v.numElements() + " < ${m * dsub} (m*dsub)");
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0; long $bestD = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $k; $j++) {
         |    int $base = ($s * $k + $j) * $dsub;
         |    long $d = 0L;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      long $diff = (long) ($v.getInt($s * $dsub + $i) - $cbRef[$base + $i]);
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $j; }
         |  }
         |  $codes[$s] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) score between an UNCOMPRESSED int8 query and a
  * PQ-ENCODED corpus vector: Σ_s dot(query_sub_s, centroid[s][codes_s]) —
  * the lookup-table kernel IVF-PQ scans cells with, here as one fused
  * exact-long loop (the query side never decodes the corpus).
  */
case class AdcScore(left: Expression, right: Expression, codebook: Array[Int],
                    m: Int, k: Int, dsub: Int)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"adc_score expects (array<int> query, array<int> codes), got " +
            s"${l.simpleString} / ${r.simpleString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val q = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    // an out-of-range code would silently index the NEXT subspace's
    // centroids in the flattened codebook and return a wrong score —
    // corrupt codes (torn artifact, config drift) must fail loud instead
    if (q.numElements() < m * dsub)
      throw new IllegalArgumentException(
        s"adc_score: query length ${q.numElements()} < ${m * dsub} (m*dsub)")
    if (codes.numElements() < m)
      throw new IllegalArgumentException(
        s"adc_score: codes length ${codes.numElements()} < $m (m)")
    var acc = 0L
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= k)
        throw new IllegalArgumentException(
          s"adc_score: code $c at subspace $s out of range [0,$k)")
      val base = (s * k + c) * dsub
      var i = 0
      while (i < dsub) {
        acc += q.getInt(s * dsub + i).toLong * codebook(base + i).toLong
        i += 1
      }
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "int[]")
    nullSafeCodeGen(ctx, ev, (q, codes) => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val base = ctx.freshName("base")
      val c = ctx.freshName("c")
      s"""
         |if ($q.numElements() < ${m * dsub})
         |  throw new IllegalArgumentException("adc_score: query length "
         |    + $q.numElements() + " < ${m * dsub} (m*dsub)");
         |if ($codes.numElements() < $m)
         |  throw new IllegalArgumentException("adc_score: codes length "
         |    + $codes.numElements() + " < $m (m)");
         |long $acc = 0L;
         |for (int $s = 0; $s < $m; $s++) {
         |  int $c = $codes.getInt($s);
         |  if ($c < 0 || $c >= $k)
         |    throw new IllegalArgumentException("adc_score: code " + $c
         |      + " at subspace " + $s + " out of range [0,$k)");
         |  int $base = ($s * $k + $c) * $dsub;
         |  for (int $i = 0; $i < $dsub; $i++) {
         |    $acc += ((long) $q.getInt($s * $dsub + $i)) * ((long) $cbRef[$base + $i]);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column wrapper: fused cosine similarity. */
  def cosine_sim(a: Column, b: Column): Column =
    ColumnShim.column(CosineSim(ColumnShim.expression(a),
      ColumnShim.expression(b)))

  /** Column wrapper: fused exact-long integer dot product. */
  def int8_dot(a: Column, b: Column): Column =
    ColumnShim.column(Int8Dot(ColumnShim.expression(a),
      ColumnShim.expression(b)))

  /** Column wrapper: PQ codes over an int8-quantized vector. */
  def pq_encode(v: Column, codebook: Array[Int], m: Int, k: Int,
                dsub: Int): Column =
    ColumnShim.column(PqEncode(ColumnShim.expression(v), codebook, m, k, dsub))

  /** Column wrapper: fused ADC score (int8 query × PQ codes). */
  def adc_score(q: Column, codes: Column, codebook: Array[Int],
                m: Int, k: Int, dsub: Int): Column =
    ColumnShim.column(AdcScore(ColumnShim.expression(q),
      ColumnShim.expression(codes), codebook, m, k, dsub))

  /** Column wrapper: all LSH table signatures in one fused loop. */
  def lsh_signatures(v: Column, planesFlat: Array[Double],
                     bitsPerTable: Int, nTables: Int): Column =
    ColumnShim.column(LshSignatures(ColumnShim.expression(v), planesFlat,
      bitsPerTable, nTables))
}
