package graft.sources.pgoutput

import org.apache.spark.sql.types._

/** Maps pg type names to Catalyst `DataType`s and maintains the
  * relation-id → schema registry the stream needs to name/type tuples
  * (reference: lib/walex/replication/publisher.ex:79-95 caches `Relation`
  * messages and patches column type OIDs from `Type` messages).
  *
  * Thread-safety: driver-side single-writer (the source's offset loop);
  * snapshots are immutable maps handed to executors per micro-batch.
  */
final class RelationRegistry {

  @volatile private var relations: Map[Int, WalMessage.Relation] = Map.empty
  @volatile private var customTypes: Map[Int, String]            = Map.empty

  def onMessage(msg: WalMessage): Unit = msg match {
    case r: WalMessage.Relation => relations = relations.updated(r.id, r)
    case t: WalMessage.PgType   => customTypes = customTypes.updated(t.id, t.name)
    case _                      => ()
  }

  def relation(id: Int): Option[WalMessage.Relation] = relations.get(id)

  /** pg type name for an OID: custom types first, then the static catalog. */
  def typeName(oid: Int): String =
    customTypes.getOrElse(oid, OidDatabase.name(oid))

  /** Catalyst schema for a relation id. */
  def schemaOf(id: Int): Option[StructType] =
    relations.get(id).map(r => RelationRegistry.toStructType(r, typeName))

  def snapshot: Map[Int, WalMessage.Relation] = relations
}

object RelationRegistry {

  /** pg type name → Catalyst DataType, per SURVEY §1.3's mapping table.
    * Unknown names degrade to StringType (never-fail property of the
    * reference cast layer, types.ex:429-431).
    */
  def sparkType(pgType: String): DataType = {
    if (pgType.startsWith("_")) return ArrayType(sparkType(pgType.substring(1)))
    if (pgType.endsWith("[]")) return ArrayType(sparkType(pgType.dropRight(2)))
    pgType match {
      case "bool" | "boolean"                   => BooleanType
      case "int2" | "smallint"                  => ShortType
      case "int4" | "int" | "integer" | "serial" => IntegerType
      case "int8" | "bigint" | "bigserial"      => LongType
      case "float4" | "real"                    => FloatType
      case "float8" | "double precision"        => DoubleType
      case "numeric" | "decimal"                => DecimalType(38, 18)
      case "money"                              => DecimalType(19, 2)
      case "timestamp"                          => TimestampNTZType
      case "timestamptz"                        => TimestampType
      case "date"                               => DateType
      case "bytea"                              => BinaryType
      // json/uuid/time/interval/inet/geometric/ranges/...: string lane
      case _                                    => StringType
    }
  }

  def toStructType(rel: WalMessage.Relation, typeNameOf: Int => String): StructType =
    StructType(rel.columns.map { c =>
      StructField(
        c.name,
        sparkType(typeNameOf(c.typeOid)),
        nullable = true,
        metadata = new MetadataBuilder()
          .putString("pgType", typeNameOf(c.typeOid))
          .putBoolean("key", c.key)
          .build())
    })
}
