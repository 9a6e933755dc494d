package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions.{CosineSim, ShingleMinHash, Simhash64}

/** Session-extension entry point: registers the engine's native expressions
  * as SQL functions, so `spark.sql("SELECT cosine_sim(a, b) ...")` works in
  * the multi-statement script executor (S6) and from plain SQL users —
  * configure with `spark.sql.extensions=graft.GraftExtensions` or call
  * [[GraftExtensions.register]] on a live session.
  *
  * SQL surface:
  *  - `cosine_sim(vecA, vecB)` — fused codegen cosine (expressions/VectorExpressions.scala)
  *  - `shingle_minhash(tokens, w, k)` — fused w-gram MinHash signature
  *    (w and k must be integer literals; they size the generated loop)
  *  - `simhash64(tokens)` — fused one-pass 64-bit SimHash
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, info, builder) triples — the same contract injectFunction uses. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(vecA, vecB) takes 2 arguments")
        CosineSim(args(0), args(1))
      }),
    (FunctionIdentifier("shingle_minhash"),
      new ExpressionInfo(classOf[ShingleMinHash].getName, "shingle_minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "shingle_minhash(tokens, w, k) takes 3 arguments")
        ShingleMinHash(args(0), intLit(args(1), "w"), intLit(args(2), "k"))
      }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[Simhash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(tokens) takes 1 argument")
        Simhash64(args(0))
      }))

  /** Register the same functions on an already-running session (tests, REPLs
    * — `spark.sql.extensions` only applies at session construction). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
