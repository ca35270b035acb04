package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DecimalType

import graft.functions.{GraftFunctions, Uint256Encode, Uint256RoundTrip, Uint256ToDecimal}

/** Session-extension entry point:
  *
  * {{{ --conf spark.sql.extensions=graft.GraftExtensions }}}
  *
  * registers the engine's SQL functions and its optimizer rule, so a
  * plain `spark-sql` user gets `uint256_encode(...)`, `minhash_sig(...)`
  * etc. plus the algebraic simplifications below with no code changes.
  * The function list is [[graft.functions.GraftFunctions.sqlBuilders]] —
  * the same builders `registerAll` installs, so the extension and the
  * library session expose an identical SQL surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => Uint256Simplification)
    GraftFunctions.sqlBuilders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
  }
}

/** Algebraic simplification for the uint256 carrier:
  * `uint256_to_decimal(uint256_encode(x))` for decimal `x` becomes
  * [[graft.functions.Uint256RoundTrip]] — the same validation semantics
  * (negatives rejected, 38-digit domain) without materializing the
  * 32-byte binary. A plain `cast` would NOT be sound: encode throws on
  * negative input, a cast would silently pass it through. Extract
  * configs that map a numeric column to both `bytes` and `Numeric38`
  * produce exactly this encode→decode pattern.
  */
object Uint256Simplification extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Uint256ToDecimal(Uint256Encode(child))
          if child.dataType.isInstanceOf[DecimalType] =>
        Uint256RoundTrip(child)
    }
}
