// Lives under org.apache.spark.sql.* for the same reason as
// VectorExpressions: FunctionRegistry + ExpressionUtils are private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.classic.ExpressionUtils

import graft.functions.GraftFunctions

/** SQL-surface registration of the scalar library (SURVEY §7.2): the
  * reference exposes its macros to SQL text (`edna_dbt_lib.<macro>` Jinja
  * expansion); the Spark analog is session-registered functions, so
  * `spark.sql("SELECT graft_uuid_v5(name, '<ns>') ...")` works for SQL-only
  * users. Each builder expands to the SAME Column-combinator expression
  * tree as the Scala API — still whole-stage codegen, no UDFs.
  */
object SqlRegistration {

  private def c(e: Expression): Column = ExpressionUtils.column(e)
  // Fully convert the ColumnNode tree to a catalyst Expression: the lazy
  // ExpressionUtils.expression wrapper leaves a ColumnNodeExpression leaf
  // the analyzer won't resolve inside a function-registry builder result.
  private def e(col: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(col.node)

  private def litString(ex: Expression, fn: String, arg: String): String = ex match {
    case Literal(v, org.apache.spark.sql.types.StringType) if v != null => v.toString
    case _ => throw new IllegalArgumentException(
      s"$fn: argument <$arg> must be a string literal")
  }
  private def litInt(ex: Expression, fn: String, arg: String): Int = ex match {
    case Literal(v, dt) if v != null && dt.isInstanceOf[org.apache.spark.sql.types.IntegralType] =>
      v.toString.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn: argument <$arg> must be an integer literal")
  }

  /** (name, builder) for every graft_ SQL function — shared by session
    * registration and the SparkSessionExtensions entry point. */
  lazy val builders: Seq[(String, Seq[Expression] => Expression)] = {
    val acc = Seq.newBuilder[(String, Seq[Expression] => Expression)]
    def add(name: String, arity: String)(builder: Seq[Expression] => Expression): Unit =
      acc += (name -> builder)
    collect(add)
    acc.result()
  }

  /** Register all graft_ SQL functions on an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "scala_udf")
    }

  private def collect(add: (String, String) => (Seq[Expression] => Expression) => Unit): Unit = {
    add("graft_uuid_v5", "(name, namespace_literal)") { args =>
      e(GraftFunctions.uuidV5(c(args(0)), litString(args(1), "graft_uuid_v5", "namespace")))
    }
    add("graft_hex_to_int", "(hex)") { args => e(GraftFunctions.hexToInt(c(args(0)))) }
    add("graft_bytes4_to_int32", "(bytes)") { args => e(GraftFunctions.bytes4ToInt32(c(args(0)))) }
    add("graft_reverse_hex_bytes", "(hex[, add0x])") { args =>
      val add0x = if (args.length > 1) litString(args(1), "graft_reverse_hex_bytes", "add0x").toBoolean else false
      e(GraftFunctions.reverseHexBytes(c(args(0)), add0x))
    }
    add("graft_base64_map", "(s, idx)") { args =>
      e(GraftFunctions.base64Map(c(args(0)), c(args(1))))
    }
    add("graft_hex_map", "(s, idx)") { args =>
      e(GraftFunctions.hexMap(c(args(0)), c(args(1))))
    }
    add("graft_digit_to_bitstring", "(digit, base_literal)") { args =>
      e(GraftFunctions.digitToBitstring(c(args(0)), litInt(args(1), "graft_digit_to_bitstring", "base")))
    }
    add("graft_value_to_bitstring", "(value, width_literal)") { args =>
      e(GraftFunctions.valueToBitstring(c(args(0)), litInt(args(1), "graft_value_to_bitstring", "width")))
    }
    add("graft_bitstring_to_int", "(bits)") { args => e(GraftFunctions.bitstringToInt(c(args(0)))) }
    add("graft_double_unbiased_exponent", "(bits)") { args =>
      e(GraftFunctions.doubleUnbiasedExponent(c(args(0))))
    }
    add("graft_double_mantissa", "(bits)") { args => e(GraftFunctions.doubleMantissa(c(args(0)))) }
    add("graft_double_from_components", "(sign, mantissa, exp)") { args =>
      e(GraftFunctions.doubleFromComponents(c(args(0)), c(args(1)), c(args(2))))
    }
    add("graft_float_vec_dot", "(a, b)") { args => FloatVecDot(args(0), args(1)) }
    add("graft_simhash", "(token_hashes, bits_literal)") { args =>
      SimHashBits(args(0), litInt(args(1), "graft_simhash", "bits"))
    }
    add("graft_int_vec_dot", "(a, b)") { args => IntVecDot(args(0), args(1)) }
    add("graft_tokens", "(text)") { args =>
      e(graft.llm.Dedup.tokens(c(args(0))))
    }
    add("graft_url_domain", "(url)") { args =>
      e(graft.llm.Curation.urlDomain(c(args(0))))
    }
    add("graft_canonicalize_url", "(url)") { args =>
      e(graft.llm.Curation.canonicalizeUrl(c(args(0))))
    }
    add("graft_text_simhash", "(text)") { args =>
      e(graft.llm.Dedup.simhash(c(args(0))))
    }
    add("graft_lang_id", "(text)") { args =>
      e(graft.llm.TextStats.langId(c(args(0))))
    }
    add("graft_unicode_normalize", "(text, form_literal)") { args =>
      UnicodeNormalize(args(0),
        litString(args(1), "graft_unicode_normalize", "form") match {
          case f @ ("NFC" | "NFD" | "NFKC" | "NFKD") => f
          case other => throw new IllegalArgumentException(
            s"graft_unicode_normalize: unknown form '$other'")
        })
    }
  }
}

/** `spark.sql.extensions` entry point: loads the graft_ function library
  * into every session built with
  * `.config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftSparkExtensions")`
  * — the idiomatic deployment for a cluster-wide install (no per-session
  * register() call). */
class GraftSparkExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    SqlRegistration.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftSparkExtensions].getName, name),
        builder))
    }
}
