package graft.rules

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** JSON codec for the reference's rule-condition wire format
  * (reference: README.md "规则JSON格式", rule_parser.py:35-72):
  *
  * {{{
  * {"logic": "AND",
  *  "conditions": [
  *    {"field": "total_asset_value", "operator": ">=", "value": 100000, "type": "number"},
  *    {"logic": "OR", "conditions": [...]}          // nested groups (our extension)
  *  ]}
  * }}}
  *
  * The reference only supports a flat condition list; nested groups are
  * a strict superset (a flat list round-trips unchanged).
  */
object RuleJson {
  private val mapper = new ObjectMapper()

  def parse(json: String): Rule = fromNode(mapper.readTree(json))

  private def fromNode(node: JsonNode): Rule = {
    if (node.has("conditions")) {
      val children = node.get("conditions").elements().asScala.map(fromNode).toSeq
      node.path("logic").asText("AND").toUpperCase match {
        case "OR"  => Or(children)
        case "NOT" => Not(children)
        case _     => And(children)
      }
    } else {
      val field = node.path("field").asText("")
      val op = node.path("operator").asText("")
      require(field.nonEmpty && op.nonEmpty, s"condition needs field+operator: $node")
      Cond(field, op, value = scalaValue(node.get("value")))
    }
  }

  private def scalaValue(node: JsonNode): Any = node match {
    case null                   => null
    case n if n.isNull          => null
    case n if n.isArray         => n.elements().asScala.map(scalaValue).toSeq
    case n if n.isIntegralNumber => n.asLong()
    case n if n.isNumber        => n.asDouble()
    case n if n.isBoolean       => n.asBoolean()
    case n                      => n.asText()
  }
}
