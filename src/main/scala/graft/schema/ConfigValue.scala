package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import scala.jdk.CollectionConverters._

/** Loss-free representation of imsc config values (YAML/JSON scalars,
  * maps, sequences) — the input language of the schema compiler
  * (ref: src/scicat_metadata.py:64-88 loads yaml/json into plain dicts).
  * Map order is preserved: variable definition order matters
  * (topological evaluation, ref: scicat_dataset.py:389-420).
  */
sealed trait ConfigValue
object ConfigValue {
  final case class CStr(s: String) extends ConfigValue
  final case class CLong(v: Long) extends ConfigValue
  final case class CDouble(v: Double) extends ConfigValue
  final case class CBool(b: Boolean) extends ConfigValue
  case object CNull extends ConfigValue
  final case class CSeq(items: Vector[ConfigValue]) extends ConfigValue
  final case class CMap(items: Vector[(String, ConfigValue)]) extends ConfigValue {
    lazy val toMap: Map[String, ConfigValue] = items.toMap
    def get(key: String): Option[ConfigValue] = toMap.get(key)
    def getStr(key: String): Option[String] = get(key).collect { case CStr(s) => s }
  }

  private val jsonMapper = new ObjectMapper()
  private val yamlMapper = new ObjectMapper(new YAMLFactory())

  def fromJson(text: String): ConfigValue = fromNode(jsonMapper.readTree(text))

  /** Mirrors the reference's "JSON first, else YAML" load with the same
    * rationale: yaml parses JSON too (ref: scicat_metadata.py:55-88). */
  def fromYamlOrJson(text: String): ConfigValue =
    try fromJson(text)
    catch { case _: Exception => fromNode(yamlMapper.readTree(text)) }

  def fromNode(n: JsonNode): ConfigValue = {
    if (n == null || n.isNull) CNull
    else if (n.isTextual) CStr(n.asText())
    else if (n.isIntegralNumber) CLong(n.asLong())
    else if (n.isNumber) CDouble(n.asDouble())
    else if (n.isBoolean) CBool(n.asBoolean())
    else if (n.isArray) CSeq(n.elements().asScala.map(fromNode).toVector)
    else if (n.isObject)
      CMap(n.properties().asScala.iterator
        .map(e => e.getKey -> fromNode(e.getValue)).toVector)
    else CStr(n.asText())
  }
}
