package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity of two numeric
  * array columns, evaluated in ONE pass per row.
  *
  * The composed `sql.functions` form needs three higher-order-function
  * aggregates per row (dot, ‖a‖², ‖b‖²), each a separate array
  * traversal outside whole-stage codegen. This expression fuses them.
  * Accumulation order (sequential, double precision) is identical to
  * the HOF form, so results are bit-equal and oracle-stable.
  */
final case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

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
        s"cosine_similarity expects array<float|double>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemIsFloat(left)
    val yf = elemIsFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Index of the centroid (element of `right`, an array<array<double>>)
  * with the highest cosine similarity to `left` (array<float|double>);
  * ties break to the LOWEST index. ONE projection pass per row — this
  * is the IVF assignment step as a shuffle-free map: the centroid set
  * is a broadcast-sized literal, so at 100 TB the corpus is scanned
  * once with zero exchanges between scan and assignment (vs the
  * corpus×nlist crossJoin + row_number window it replaces).
  */
final case class ArgMaxCosine(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def vecOk(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val centsOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (vecOk(left.dataType) && centsOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argmax_cosine expects (array<float|double>, array<array<double>>), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val vf = elemIsFloat
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    val nc = cents.numElements()
    while (c < nc) {
      val cent = cents.getArray(c)
      val n = math.min(v.numElements(), cent.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = if (vf) v.getFloat(i).toDouble else v.getDouble(i)
        val yi = cent.getDouble(i)
        dot += xi * yi
        na += xi * xi
        nb += yi * yi
        i += 1
      }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Registers graft's native vector functions in the active session
    * (idempotent) and returns a cosine-similarity column. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val spark = SparkSession.active
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", es => CosineSimilarity(es.head, es(1)), "built-in")
    call_function("graft_cosine", a, b)
  }

  /** Nearest-centroid index by cosine over a literal centroid matrix. */
  def argMaxCosine(vec: Column, centroids: Column): Column = {
    val spark = SparkSession.active
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_argmax_cosine", es => ArgMaxCosine(es.head, es(1)), "built-in")
    call_function("graft_argmax_cosine", vec, centroids)
  }
}
