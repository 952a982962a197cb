package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, MinHashSignature, SimHash, ZOrderCode}

/** Session extensions registering graft's native expressions for SQL.
  *
  * Two entry points, both supported Spark extension mechanisms:
  *  - config-time: `SparkSession.builder().withExtensions(new
  *    GraftExtensions)` or `spark.sql.extensions=graft.GraftExtensions`
  *  - runtime: `GraftExtensions.register(spark)` on an existing session
  *    (what Verify/Bench use, since the driver owns the builder).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineFunction)
    e.injectFunction(GraftExtensions.minhashFunction)
    e.injectFunction(GraftExtensions.simhashFunction)
    e.injectFunction(GraftExtensions.zorderFunction)
  }
}

object GraftExtensions {

  private val cosineBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "cosine_similarity(a, b) takes 2 arguments")
    CosineSimilarity(exprs.head, exprs(1))
  }

  val cosineFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName, "cosine_similarity"),
    cosineBuilder)

  private val minhashBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3,
      "minhash_signature(text, n, k) takes 3 arguments (n, k integer literals)")
    def lit(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"minhash_signature: $what must be an integer literal, got $other")
    }
    MinHashSignature(exprs.head, lit(exprs(1), "n"), lit(exprs(2), "k"))
  }

  val minhashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_signature"),
    new ExpressionInfo(classOf[MinHashSignature].getCanonicalName, "minhash_signature"),
    minhashBuilder)

  private val simhashBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "simhash(text, bits) takes 2 arguments (bits an integer literal)")
    val bits = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"simhash: bits must be an integer literal, got $other")
    }
    SimHash(exprs.head, bits)
  }

  val simhashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash"),
    new ExpressionInfo(classOf[SimHash].getCanonicalName, "simhash"),
    simhashBuilder)

  private val zorderBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3,
      "zorder_code(x, y, bits) takes 3 arguments (bits an integer literal)")
    val bits = exprs(2) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"zorder_code: bits must be an integer literal, got $other")
    }
    ZOrderCode(exprs.head, exprs(1), bits)
  }

  val zorderFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("zorder_code"),
    new ExpressionInfo(classOf[ZOrderCode].getCanonicalName, "zorder_code"),
    zorderBuilder)

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", cosineBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature", minhashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash", simhashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder_code", zorderBuilder, "built-in")
  }
}
