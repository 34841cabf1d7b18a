package graft.operators.cdc

import graft.plans.PgCasts
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** P3 — tuple → typed record projection (reference:
  * lib/walex/replication/publisher.ex:247-279 zips Relation.columns with
  * tuple positions, lib/walex/casting/types.ex casts each text cell).
  *
  * Input: rows carrying a `map<string,string>` record of text wire values
  * (as emitted by the CDC source); output: one typed column per relation
  * column, cast per the pg type carried in the schema's `pgType` field
  * metadata (built by RelationRegistry.toStructType). Everything is a
  * column expression — the cast table stays inside whole-stage codegen and
  * Catalyst prunes unused columns back into the record map access.
  *
  * Never-throw property (types.ex:429-431): `cast` returns NULL on garbage
  * rather than failing the stream; unknown pg types stay strings.
  */
object TypedRecords {

  /** Cast one text cell to its pg-typed Catalyst column. */
  def castText(raw: Column, pgType: String): Column = {
    if (pgType.startsWith("_"))
      return castArrayText(raw, pgType.substring(1))
    if (pgType.endsWith("[]"))
      return castArrayText(raw, pgType.dropRight(2))
    castScalarText(raw, pgType)
  }

  private def castScalarText(raw: Column, pgType: String): Column = pgType match {
    // try_cast: never-throw (types.ex:429-431) under Spark 4's ANSI default
    case "bool" | "boolean"                    => PgCasts.pgBool(raw)
    case "int2" | "smallint"                   => raw.try_cast(ShortType)
    case "int4" | "int" | "integer" | "serial" => raw.try_cast(IntegerType)
    case "int8" | "bigint" | "bigserial"       => raw.try_cast(LongType)
    case "float4" | "real"                     => raw.try_cast(FloatType)
    case "float8" | "double precision"         => raw.try_cast(DoubleType)
    case "numeric" | "decimal"                 => PgCasts.pgNumeric(raw)
    case "money"                               => PgCasts.pgMoney(raw)
    case "timestamp"                           => raw.try_cast(TimestampNTZType)
    case "timestamptz"                         => PgCasts.pgTimestamp(raw)
    case "date"                                => PgCasts.pgDate(raw)
    case "bytea"                               => PgCasts.pgBytea(raw)
    case "time"                                => PgCasts.pgTime(raw)
    case "timetz"                              => PgCasts.pgTimeTz(raw)
    case "interval"                            => PgCasts.pgInterval(raw)
    case "json" | "jsonb"                      => PgCasts.pgJson(raw)
    // uuid/inet/geometric/ranges/…: string passthrough (types.ex:102,145-187)
    case _                                     => raw
  }

  private def castArrayText(raw: Column, elemType: String): Column =
    transform(PgCasts.pgArrayParse(raw), e => castScalarText(e, elemType))

  /** Project a record-map column into typed columns per `schema`, keeping
    * `keep` passthrough columns in front. The pg type of each field comes
    * from its `pgType` metadata (RelationRegistry.toStructType), falling
    * back to a type inferred from the Catalyst type.
    */
  def project(df: DataFrame, recordCol: Column, schema: StructType,
      keep: Seq[Column] = Seq.empty): DataFrame = {
    val typed = schema.fields.map { f =>
      val pg = if (f.metadata.contains("pgType")) f.metadata.getString("pgType")
               else pgNameFor(f.dataType)
      castText(element_at(recordCol, f.name), pg).as(f.name)
    }
    df.select(keep ++ typed: _*)
  }

  private def pgNameFor(dt: DataType): String = dt match {
    case BooleanType      => "bool"
    case ShortType        => "int2"
    case IntegerType      => "int4"
    case LongType         => "int8"
    case FloatType        => "float4"
    case DoubleType       => "float8"
    case _: DecimalType   => "numeric"
    case TimestampNTZType => "timestamp"
    case TimestampType    => "timestamptz"
    case DateType         => "date"
    case BinaryType       => "bytea"
    case _                => "text"
  }
}
