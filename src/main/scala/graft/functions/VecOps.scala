package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native dot product over two numeric array columns.
  *
  * The reference computes vector dot products inside per-peer Java loops
  * (`commons/src/main/java/org/apache/hama/commons/math/DenseDoubleVector
  * .java:34` `dotUnsafe`); the Spark-native hot path is a Catalyst
  * `Expression` with `doGenCode` — a tight primitive loop inlined into
  * whole-stage codegen, no row explosion, no lambda dispatch. Spark's own
  * higher-order functions (`aggregate`/`zip_with`) are `CodegenFallback`
  * territory and allocate an intermediate array per row; this does neither.
  *
  * Element types float/double/int/long are read natively (no upfront
  * `CAST(array)` copy); accumulation is double. Null elements count as 0;
  * length mismatch uses the common prefix.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a: NumericType, _), ArrayType(b: NumericType, _))
        if supported(a) && supported(b) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs two numeric arrays, got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  private def supported(t: NumericType): Boolean = t match {
    case FloatType | DoubleType | IntegerType | LongType => true
    case _ => false
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (ta, tb) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += get(a, i, ta) * get(b, i, tb)
      i += 1
    }
    acc
  }

  private def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case _ => throw new IllegalStateException(s"unsupported element type $t")
  }

  private def getter(t: DataType): String = t match {
    case FloatType => "getFloat"
    case DoubleType => "getDouble"
    case IntegerType => "getInt"
    case LongType => "getLong"
    case _ => throw new IllegalStateException(s"unsupported element type $t")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val (ga, gb) = (getter(elemType(left)), getter(elemType(right)))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (double) $a.$ga($i) * (double) $b.$gb($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** Column-API surface for the native vector expressions. */
object VecOps {
  def vecDot(a: Column, b: Column): Column =
    bridge.column(VecDot(bridge.expression(a), bridge.expression(b)))

  /** ‖v‖₂ via the same native loop */
  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  /** cosine similarity a·b / (‖a‖‖b‖) */
  def cosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))
}
