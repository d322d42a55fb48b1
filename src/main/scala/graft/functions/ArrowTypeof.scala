package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DataFusion's `arrow_typeof(expr)` — renders the argument's Arrow
  * type name (types/decimal/decimal_aggregates.result pins
  * `Decimal128(4, 1)`, types/interval/interval.result pins
  * `Interval(MonthDayNano)`). Purely type-directed: evaluates without
  * touching the value.
  */
case class ArrowTypeof(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "arrow_typeof"

  private def name(dt: DataType): String = dt match {
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case StringType => "Utf8"
    case BooleanType => "Boolean"
    case BinaryType => "Binary"
    case DateType => "Date32"
    case d: DecimalType => s"Decimal128(${d.precision}, ${d.scale})"
    case TimestampType | TimestampNTZType => "Timestamp(Millisecond, None)"
    case _: DayTimeIntervalType | _: YearMonthIntervalType |
        CalendarIntervalType => "Interval(MonthDayNano)"
    case NullType => "Null"
    case ArrayType(e, _) => s"List(Field { name: \"item\", data_type: ${name(e)} })"
    case other => other.simpleString
  }

  override def eval(input: InternalRow): Any =
    UTF8String.fromString(name(child.dataType))

  override protected def withNewChildInternal(newChild: Expression): ArrowTypeof =
    copy(child = newChild)
}
