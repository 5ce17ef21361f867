package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Native Catalyst expressions for the hot sketch/vector kernels.
  *
  * The composable forms (`transform`/`aggregate`/`zip_with` chains) are
  * semantically identical but pay two structural costs at scale: higher-order
  * functions evaluate interpreted (per-element lambda dispatch + boxing), and
  * 64-slot expression trees are huge (slow analysis, codegen near the
  * maxFields/hugeMethod cliffs, heavy first-run JIT). Each expression here is
  * ONE tree node whose doGenCode emits a call into a tight static JVM loop —
  * the preferred shape for a hot custom kernel (a native Expression beats a
  * Scala UDF: no Row conversion, null handling stays in codegen).
  *
  * Semantics are kept bit-identical to the composable forms (same fold order,
  * same float→double widening), so the DuckDB oracles are unchanged.
  */
object NativeKernels {
  /** MinHash: out(j) = min over xs of (A(j)·x + B(j)) mod P. */
  def minhashSig(xs: ArrayData, num: Int): ArrayData = {
    val out = new Array[Long](num)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = xs.numElements()
    var i = 0
    while (i < n) {
      val x = xs.getLong(i)
      var j = 0
      while (j < num) {
        val h = (Dedup.hashA(j) * x + Dedup.hashB(j)) % Dedup.P
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** SimHash: bit j set when the majority of hashes have bit j set. */
  def simhashFp(hs: ArrayData, bits: Int): Long = {
    val n = hs.numElements()
    val counts = new Array[Long](bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < bits) {
        counts(j) += (h >> j) & 1L
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) * 2 > n) fp |= 1L << j
      j += 1
    }
    fp
  }

  /** Sign-LSH bucket: bit j of the result is the sign of the dot product
    * of the (float) embedding with pseudo-random hyperplane j, where
    * w(j)(d) = (((j·dim+d)·2654435761) mod 2001 − 1000)/1000 — the same
    * formula as Similarity.planeComponent, evaluated inline.
    */
  def lshBucket(emb: ArrayData, planes: Int): Long = {
    val dim = emb.numElements()
    var bucket = 0L
    var j = 0
    while (j < planes) {
      var dot = 0.0
      var d = 0
      while (d < dim) {
        val w = (((j.toLong * dim + d) * 2654435761L) % 2001L - 1000L) / 1000.0
        dot += emb.getFloat(d).toDouble * w
        d += 1
      }
      if (dot >= 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  /** Cosine over float arrays, accumulated in double, sequential order —
    * identical to fold(0.0)(+) over per-element products.
    */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** minhash_sig(array<long>) → array<long> of `num` signature slots. */
case class MinHashSigExpr(child: Expression, num: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    NativeKernels.minhashSig(input.asInstanceOf[ArrayData], num)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NativeKernels.minhashSig($c, $num);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** simhash_fp(array<long>) → 60-bit long fingerprint. */
case class SimHashFpExpr(child: Expression, bits: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    NativeKernels.simhashFp(input.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NativeKernels.simhashFp($c, $bits);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** lsh_bucket(array<float>) → long bucket id of `planes` sign bits. */
case class LshBucketExpr(child: Expression, planes: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    NativeKernels.lshBucket(input.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NativeKernels.lshBucket($c, $planes);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** cosine_f(array<float>, array<float>) → double. */
case class CosineFExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    NativeKernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.NativeKernels.cosineF($a, $b);")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
