// Lives under org.apache.spark.sql (like Bridge): same-session registration
// needs `sessionState.functionRegistry`, which is private[sql] in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration for the native graft expressions, so a
  * `spark.sql(...)` user gets the same codegen'd kernels the DataFrame DSL
  * wrappers ([[graft.functions.TextFunctions]], VectorFunctions) use —
  * one implementation, two surfaces.
  *
  * Two deployment shapes:
  *  - cluster-wide: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the [[org.apache.spark.sql.SparkSessionExtensions]] injection path —
  *    every session on the cluster sees the functions at analysis time);
  *  - per-session: [[register]] on an existing session (test harnesses,
  *    notebooks).
  */
object GraftFunctions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case l: Literal if l.value.isInstanceOf[Number] =>
      l.value.asInstanceOf[Number].intValue
    case _ =>
      throw new IllegalArgumentException(
        s"$fn: the count argument must be an integer literal (got $e)")
  }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  /** (name, implementing class, builder) for every registered function. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", classOf[DotProduct].getName, { args =>
      arity("graft_dot", 2, args); DotProduct(args(0), args(1))
    }),
    ("graft_tokens", classOf[WhitespaceTokens].getName, { args =>
      arity("graft_tokens", 1, args); WhitespaceTokens(args.head)
    }),
    ("graft_simhash", classOf[SimHash64].getName, { args =>
      arity("graft_simhash", 1, args); SimHash64(args.head)
    }),
    ("graft_sorted_intersect_count", classOf[SortedIntersectCount].getName, { args =>
      arity("graft_sorted_intersect_count", 2, args)
      SortedIntersectCount(args(0), args(1))
    }),
    ("graft_ngram_hashes", classOf[NGramHashes].getName, { args =>
      arity("graft_ngram_hashes", 2, args)
      NGramHashes(args(0), intLit(args(1), "graft_ngram_hashes"))
    }),
    ("graft_minhash", classOf[MinHashSignature].getName, { args =>
      arity("graft_minhash", 2, args)
      MinHashSignature(args(0), intLit(args(1), "graft_minhash"))
    }),
    ("graft_max_multiplicity", classOf[MaxMultiplicity].getName, { args =>
      arity("graft_max_multiplicity", 1, args); MaxMultiplicity(args.head)
    }),
    ("graft_quantize_int8", classOf[QuantizeInt8].getName, { args =>
      arity("graft_quantize_int8", 1, args); QuantizeInt8(args.head)
    }),
    ("graft_deflate_len", classOf[DeflateLength].getName, { args =>
      arity("graft_deflate_len", 1, args); DeflateLength(args.head)
    }),
    ("graft_normalize_unicode", classOf[NormalizeText].getName, { args =>
      arity("graft_normalize_unicode", 1, args); NormalizeText(args.head)
    }),
    // aggregate: the analyzer wraps a bare AggregateFunction from a
    // registry builder in its AggregateExpression automatically.
    ("graft_top_k", classOf[GroupTopK].getName, { args =>
      arity("graft_top_k", 3, args)
      GroupTopK(args(0), args(1), intLit(args(2), "graft_top_k"))
    }),
    ("graft_heavy_hitters", classOf[MisraGries].getName, { args =>
      arity("graft_heavy_hitters", 2, args)
      MisraGries(args(0), intLit(args(1), "graft_heavy_hitters"))
    }))

  /** Extension-injection path (analysis-time, all sessions). */
  def install(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, cls, builder) =>
      ext.injectFunction((FunctionIdentifier(name), new ExpressionInfo(cls, name), builder))
    }

  /** Same-session path: register directly into the session's function
    * registry. Idempotent (re-registration replaces the same builder). */
  def register(spark: SparkSession): Unit = {
    val registry = spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState
      .functionRegistry
    functions.foreach { case (name, cls, builder) =>
      registry.registerFunction(FunctionIdentifier(name), new ExpressionInfo(cls, name), builder)
    }
  }
}
