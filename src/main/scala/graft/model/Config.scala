package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Target column types accepted by the engine.
  *
  * Mirrors the reference's documented type set (README.md:92-97). The
  * reference only wires six of them (subgraph_extractor/cli.py:147-155);
  * the documented-but-unwired int8..float64 are implemented here too —
  * the gap is a reference bug we do not replicate (SURVEY.md §1.3).
  *
  * Spark has no unsigned types, so:
  *   - uint32 → LongType (always in range)
  *   - uint64 → DecimalType(20,0) (lossless; the clamp/validity mappings
  *     make any narrowing explicit)
  *   - uint256 / PG numeric → BinaryType, 32-byte big-endian (sortable,
  *     lossless carrier; reference cli.py:139-141)
  */
object TargetType extends Enumeration {
  val UInt32, UInt64, Bytes, Bool, Str, Numeric38, Int8, Int16, Int32, Int64,
      Float32, Float64 = Value

  def parse(s: String): TargetType.Value = s.toLowerCase(java.util.Locale.ROOT) match {
    case "uint32"            => UInt32
    case "uint64"            => UInt64
    case "bytes"             => Bytes
    case "bool" | "boolean"  => Bool
    case "string" | "text"   => Str
    case "numeric38"         => Numeric38
    case "int8"              => Int8
    case "int16"             => Int16
    case "int32"             => Int32
    case "int64"             => Int64
    case "float32"           => Float32
    case "float64"           => Float64
    case other => throw new IllegalArgumentException(s"unknown target type: $other")
  }

  /** Canonical serialized name — MUST be accepted by [[parse]] so
    * `fromJson(toJson(cfg))` round-trips for every type (`Str.toString
    * .toLowerCase` would yield "str", which parse rejects).
    */
  def canonicalName(t: TargetType.Value): String = t match {
    case Str   => "string"
    case other => other.toString.toLowerCase(java.util.Locale.ROOT)
  }

  def toSpark(t: TargetType.Value): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    t match {
      case UInt32    => LongType
      case UInt64    => DecimalType(20, 0)
      case Bytes     => BinaryType
      case Bool      => BooleanType
      case Str       => StringType
      case Numeric38 => DecimalType(38, 0)
      case Int8      => ByteType
      case Int16     => ShortType
      case Int32     => IntegerType
      case Int64     => LongType
      case Float32   => FloatType
      case Float64   => DoubleType
    }
  }
}

/** One derived-column mapping (reference README.md:56-88, cli.py:110-133).
  *
  * Applied to a source column, produces a NEW column named `name` of type
  * `toType`, optionally:
  *   - downscaled by integer floor-division (`downscale`, lossy by design)
  *   - clamped: `value <= maxValue ? value : default` with an optional
  *     boolean `validityColumn` recording which rows were in range
  */
final case class ColumnMapping(
    name: String,
    toType: TargetType.Value,
    downscale: Option[BigInt] = None,
    maxValue: Option[BigInt] = None,
    default: Option[BigInt] = None,
    validityColumn: Option[String] = None)

/** Per-table extraction config (reference config YAML `tables.<name>`). */
final case class TableConfig(
    partitionSizes: Seq[Long],
    columnMappings: Map[String, Seq[ColumnMapping]] = Map.empty)

/** Whole extraction config (reference cli.py:200-202; shape
  * tests/test_get_column_info.py:16-25). Serialized as JSON (the driver
  * environment is offline — no YAML dependency; JSON is a YAML subset).
  */
final case class ExtractConfig(
    name: String,
    version: String,
    subgraph: String,
    tables: Map[String, TableConfig])

object ExtractConfig {

  def toJson(c: ExtractConfig): String = {
    def mapping(m: ColumnMapping): JObject = {
      val fields = List(
        Some(JField("type", JString(TargetType.canonicalName(m.toType)))),
        m.downscale.map(v => JField("downscale", JInt(v))),
        m.maxValue.map(v => JField("max_value", JInt(v))),
        m.default.map(v => JField("default", JInt(v))),
        m.validityColumn.map(v => JField("validity_column", JString(v)))
      ).flatten
      JObject(JField("name", JString(m.name)) :: fields)
    }
    val tables = JObject(c.tables.toList.sortBy(_._1).map { case (t, tc) =>
      JField(
        t,
        JObject(
          JField("partition_sizes", JArray(tc.partitionSizes.toList.map(s => JInt(BigInt(s))))) ::
            (if (tc.columnMappings.isEmpty) Nil
             else
               List(JField(
                 "column_mappings",
                 JObject(tc.columnMappings.toList.sortBy(_._1).map { case (col, ms) =>
                   JField(col, JArray(ms.toList.map(mapping)))
                 }))))
        ))
    })
    val root = JObject(
      JField("name", JString(c.name)),
      JField("version", JString(c.version)),
      JField("subgraph", JString(c.subgraph)),
      JField("tables", tables))
    JsonMethods.pretty(JsonMethods.render(root))
  }

  def fromJson(s: String): ExtractConfig = {
    val root = JsonMethods.parse(s)
    def str(j: JValue, f: String): String = (j \ f) match {
      case JString(v) => v
      case other      => throw new IllegalArgumentException(s"field $f: expected string, got $other")
    }
    def bigIntOpt(j: JValue, f: String): Option[BigInt] = (j \ f) match {
      case JInt(v)     => Some(v)
      case JLong(v)    => Some(BigInt(v))
      case JDecimal(v) => Some(v.toBigInt)
      case JNothing    => None
      case other       => throw new IllegalArgumentException(s"field $f: expected int, got $other")
    }
    def mapping(j: JValue): ColumnMapping = ColumnMapping(
      name = str(j, "name"),
      toType = TargetType.parse(str(j, "type")),
      downscale = bigIntOpt(j, "downscale"),
      maxValue = bigIntOpt(j, "max_value"),
      default = bigIntOpt(j, "default"),
      validityColumn = (j \ "validity_column") match {
        case JString(v) => Some(v)
        case _          => None
      }
    )
    val tables = (root \ "tables") match {
      case JObject(fields) =>
        fields.map { case JField(tname, tj) =>
          val sizes = (tj \ "partition_sizes") match {
            case JArray(vs) =>
              vs.map {
                case JInt(v)  => v.toLong
                case JLong(v) => v
                case other    => throw new IllegalArgumentException(s"partition size: $other")
              }
            case other => throw new IllegalArgumentException(s"partition_sizes: $other")
          }
          val cms = (tj \ "column_mappings") match {
            case JObject(cols) =>
              cols.map { case JField(col, arr) =>
                arr match {
                  case JArray(ms) => col -> ms.map(mapping)
                  case single     => col -> List(mapping(single))
                }
              }.toMap
            case _ => Map.empty[String, Seq[ColumnMapping]]
          }
          // fail at parse time, not mid-extract: a tier list whose sizes
          // don't divide each other can never produce a valid plan
          try graft.plans.Partitioner.validateTiers(sizes)
          catch {
            case e: IllegalArgumentException =>
              throw new IllegalArgumentException(
                s"table '$tname': invalid partition_sizes: ${e.getMessage}")
          }
          tname -> TableConfig(sizes, cms)
        }.toMap
      case other => throw new IllegalArgumentException(s"tables: $other")
    }
    ExtractConfig(str(root, "name"), str(root, "version"), str(root, "subgraph"), tables)
  }

  /** Config immutability check (reference cli.py:205-217): a dataset's
    * config is written once; any later run must present a semantically
    * identical config or abort. Compared as parsed JSON trees, so
    * formatting differences don't matter.
    */
  def requireUnchanged(existingJson: String, incoming: ExtractConfig): Unit = {
    val a = JsonMethods.parse(existingJson)
    val b = JsonMethods.parse(toJson(incoming))
    if (a != b)
      throw new IllegalStateException(
        s"config drift: dataset was created with a different config; " +
          s"diff=${(a diff b)}")
  }
}
