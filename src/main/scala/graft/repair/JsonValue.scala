package graft.repair

import scala.collection.mutable

/** Dynamic JSON value — the engine-side equivalent of the reference's
  * `JSONReturnType` (utils/constants.py:14). Objects preserve insertion
  * order with last-write-wins duplicate keys, matching Python dict
  * semantics. Ints are arbitrary precision (Python int).
  */
sealed trait JsonValue {
  /** Python truthiness (`if j:`). */
  def isTruthy: Boolean = this match {
    case JNull => false
    case JBool(b) => b
    case JInt(v) => v != 0
    case JFloat(v) => v != 0.0
    case JStr(s) => s.nonEmpty
    case JArr(xs) => xs.nonEmpty
    case o: JObj => o.fields.nonEmpty
  }

  /** `ObjectComparer.is_strictly_empty` (utils/object_comparer.py:41-47). */
  def isStrictlyEmpty: Boolean = this match {
    case JStr("") => true
    case JArr(xs) => xs.isEmpty
    case o: JObj => o.fields.isEmpty
    case _ => false
  }
}

case object JNull extends JsonValue
final case class JBool(value: Boolean) extends JsonValue
final case class JInt(value: BigInt) extends JsonValue
final case class JFloat(value: Double) extends JsonValue
final case class JStr(value: String) extends JsonValue
final case class JArr(items: mutable.ArrayBuffer[JsonValue]) extends JsonValue
final case class JObj(fields: mutable.LinkedHashMap[String, JsonValue]) extends JsonValue

object JArr { def empty: JArr = JArr(mutable.ArrayBuffer.empty) }
object JObj { def empty: JObj = JObj(mutable.LinkedHashMap.empty) }

object JsonValue {

  /** `ObjectComparer.is_same_object` (utils/object_comparer.py:9-39):
    * same type + same keys/shape recursively; atoms compare by type only.
    * Python type identity: bool / int / float / str / list / dict / None. */
  def sameShape(a: JsonValue, b: JsonValue): Boolean = (a, b) match {
    case (JObj(fa), JObj(fb)) =>
      fa.size == fb.size && fa.keysIterator.forall(k =>
        fb.contains(k) && sameShape(fa(k), fb(k)))
    case (JArr(xa), JArr(xb)) =>
      xa.length == xb.length && xa.indices.forall(i => sameShape(xa(i), xb(i)))
    case (JNull, JNull) => true
    case (_: JBool, _: JBool) => true
    case (_: JInt, _: JInt) => true
    case (_: JFloat, _: JFloat) => true
    case (_: JStr, _: JStr) => true
    case _ => false
  }
}
