package graft.repair

import scala.collection.mutable

import org.apache.spark.sql.types._

/** Spark-native analogue of the reference's pydantic ingestion
  * (`schema_from_input`, schema_repair.py:91-121): derive a JSON Schema
  * from a Scala case class via its Catalyst `StructType` (Encoders.product),
  * so a typed model drives the same schema-guided repair the reference
  * drives from a pydantic model.
  */
object SchemaOf {

  /** JSON Schema for a case class `T`. Non-nullable fields become
    * `required`; nullable ones get `["<type>", "null"]` unions. */
  def apply[T <: Product: scala.reflect.runtime.universe.TypeTag]: JsonValue =
    fromStructType(org.apache.spark.sql.Encoders.product[T].schema)

  /** Runtime analogue of the reference's `load_schema_model`
    * (schema_repair.py:63-71, 'module:ClassName'): resolve a model by name
    * and derive its guiding schema. Accepts either a fully-qualified Scala
    * case-class name (resolved reflectively to its Catalyst schema) or a
    * Spark DDL struct string (e.g. "k INT NOT NULL, name STRING"). */
  def forModel(spec: String): JsonValue = {
    val byClass: Option[StructType] =
      try {
        val m = scala.reflect.runtime.universe.runtimeMirror(getClass.getClassLoader)
        val tpe = m.staticClass(spec).selfType
        org.apache.spark.sql.catalyst.ScalaReflection.schemaFor(tpe).dataType match {
          case s: StructType => Some(s)
          case _ => None
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    val st = byClass.getOrElse {
      try StructType.fromDDL(spec)
      catch {
        case scala.util.control.NonFatal(_) =>
          throw new IllegalArgumentException(
            s"Schema model '$spec' is neither a resolvable case class nor a DDL struct.")
      }
    }
    fromStructType(st)
  }

  def fromStructType(st: StructType): JsonValue = {
    val props = mutable.LinkedHashMap.empty[String, JsonValue]
    val required = mutable.ArrayBuffer.empty[JsonValue]
    st.fields.foreach { f =>
      props(f.name) = fieldSchema(f.dataType, f.nullable)
      if (!f.nullable) required += JStr(f.name)
    }
    val out = mutable.LinkedHashMap[String, JsonValue](
      "type" -> JStr("object"),
      "properties" -> JObj(props))
    if (required.nonEmpty) out("required") = JArr(required)
    JObj(out)
  }

  private def fieldSchema(dt: DataType, nullable: Boolean): JsonValue = {
    val base: JsonValue = dt match {
      case StringType => typeOf("string")
      case ByteType | ShortType | IntegerType | LongType => typeOf("integer")
      case FloatType | DoubleType | _: DecimalType => typeOf("number")
      case BooleanType => typeOf("boolean")
      case ArrayType(el, elNullable) =>
        JObj(mutable.LinkedHashMap(
          "type" -> JStr("array"),
          "items" -> fieldSchema(el, elNullable)))
      case s: StructType => fromStructType(s)
      case MapType(_, v, vNullable) =>
        JObj(mutable.LinkedHashMap(
          "type" -> JStr("object"),
          "additionalProperties" -> fieldSchema(v, vNullable)))
      case BinaryType => typeOf("string") // opaque payloads travel encoded
      case _ => JBool(true)
    }
    if (!nullable) base
    else base match {
      case JObj(f) if f.size == 1 && f.contains("type") =>
        JObj(mutable.LinkedHashMap("type" -> JArr(mutable.ArrayBuffer(
          f("type"), JStr("null")))))
      case other =>
        JObj(mutable.LinkedHashMap("anyOf" -> JArr(mutable.ArrayBuffer(
          other, typeOf("null")))))
    }
  }

  private def typeOf(t: String): JsonValue =
    JObj(mutable.LinkedHashMap("type" -> JStr(t)))
}
