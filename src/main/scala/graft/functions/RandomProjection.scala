package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Johnson–Lindenstrauss random projection `R^d → R^m` as a native
  * codegen expression — the standard dimensionality-reduction step
  * before ANN at corpus scale (project 100 TB of wide embeddings down to
  * a fraction of the bytes ONCE, map-side, then run every downstream
  * search/dedup pass on the narrow vectors).
  *
  * The projection matrix is the Achlioptas ±1 sign matrix derived from
  * md5 — `sign(j,i)` is the parity of the first hex nibble of
  * `md5("<seed>:<j>:<i>")` — so it is deterministic, identical across
  * engines (the DuckDB oracle reconstructs the same matrix in SQL, the
  * same trick [[MinHashSignature]] and [[SimHash]] use), and never needs
  * to be stored or broadcast. `y_j = round(⟨x, sign_j⟩ / √m, 6)` with a
  * left-to-right double fold per output coordinate — the same fold order
  * as DuckDB's `list_dot_product` — and Spark `Round`'s exact
  * `BigDecimal HALF_UP` path, so results are bit-identical across
  * engines. The matrix is built once per JVM per (d, m, seed) and cached.
  *
  * Malformed input contract (matches [[L2SqMicro]]): null elements yield
  * NULL.
  */
case class RandomProjection(child: Expression, toDim: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) if toDim > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"random_projection expects array<float|double> and toDim > 0, got " +
            s"${child.dataType.simpleString}, toDim=$toDim")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any =
    RandomProjection.projectData(a.asInstanceOf[ArrayData], toDim, seed, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = if (elemIsFloat) "true" else "false"
    nullSafeCodeGen(ctx, ev, x => {
      val out = ctx.freshName("proj")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.RandomProjection.projectData($x, $toDim, ${seed}L, $f);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RandomProjection {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Array[Double]]]()

  /** Sign matrix rows (one per output coordinate j, length d), cached per
    * JVM. sign(j,i) = +1 if the first hex nibble of md5("seed:j:i") is
    * odd, else -1 — reproducible in ANSI SQL.
    */
  private def signs(d: Int, m: Int, seed: Long): Array[Array[Double]] =
    cache.computeIfAbsent((d, m, seed), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(m) { j =>
        Array.tabulate(d) { i =>
          md.reset()
          val h = md.digest(s"$seed:$j:$i".getBytes("UTF-8"))
          if (((h(0) >> 4) & 1) == 1) 1.0 else -1.0
        }
      }
    })

  /** Shared kernel for interpreted and generated code. Returns null for
    * null elements (the malformed-input contract).
    */
  def projectData(x: ArrayData, toDim: Int, seed: Long, isFloat: Boolean): ArrayData = {
    val n = x.numElements()
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      xs(i) = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    val m = signs(n, toDim, seed)
    val inv = 1.0 / math.sqrt(toDim.toDouble)
    val out = new Array[Double](toDim)
    var j = 0
    while (j < toDim) {
      val row = m(j)
      var acc = 0.0
      var k = 0
      while (k < n) { acc += xs(k) * row(k); k += 1 }
      out(j) = java.math.BigDecimal.valueOf(acc * inv)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column form: `RandomProjection(vec, toDim, seed)`. */
  def apply(vec: Column, toDim: Int, seed: Long): Column =
    ColumnBridge.column(RandomProjection(ColumnBridge.expression(vec), toDim, seed))
}
