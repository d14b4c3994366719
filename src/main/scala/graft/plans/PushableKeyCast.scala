package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: turn JS-style loose key equality back into a pushable
  * native predicate.
  *
  * The reference compares ids with `String(item.id) == params.id`
  * (/root/reference/pages/launch/[id].js:33), which maps to
  * `cast(key as string) = '42'` — a filter Spark cannot push into a parquet
  * scan because the cast wraps the column. At 100 TB that is the difference
  * between pruning row groups at the source and scanning everything.
  *
  * Rewrite `cast(intCol as string) = 'lit'` → `intCol = lit:long` — but ONLY
  * when the literal round-trips through the integral type unchanged
  * ('042' must NOT match 42 under string semantics, so it is left alone).
  *
  * Registered via [[graft.GraftExtensions]] (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  */
object PushableKeyCast extends Rule[LogicalPlan] {

  private def roundTrips(s: String, dt: DataType): Option[Long] = {
    val parsed = try Some(s.toLong) catch { case _: NumberFormatException => None }
    parsed.filter(_.toString == s).filter { v =>
      dt match {
        case LongType    => true
        case IntegerType => v.isValidInt
        case ShortType   => v.isValidShort
        case ByteType    => v.isValidByte
        case _           => false
      }
    }
  }

  private def narrowed(v: Long, dt: DataType): Literal = dt match {
    case LongType    => Literal(v)
    case IntegerType => Literal(v.toInt)
    case ShortType   => Literal(v.toShort)
    case ByteType    => Literal(v.toByte)
    case other       => throw new IllegalStateException(s"unexpected $other")
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private def rewrite(col: Expression, s: UTF8String): Option[Expression] =
    roundTrips(s.toString, col.dataType).map(v => EqualTo(col, narrowed(v, col.dataType)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case eq @ EqualTo(Cast(col, _: StringType, _, _), Literal(s: UTF8String, _: StringType))
          if isIntegral(col.dataType) =>
        rewrite(col, s).getOrElse(eq)
      case eq @ EqualTo(Literal(s: UTF8String, _: StringType), Cast(col, _: StringType, _, _))
          if isIntegral(col.dataType) =>
        rewrite(col, s).getOrElse(eq)
    }
}
