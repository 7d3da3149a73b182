package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import com.fasterxml.jackson.databind.JsonNode

/** Compiler for the reference's stored DynamicLayerConfig JSON graph-step
  * queries (reference: indexfilter/DynamicIndexReader.java:46-113,
  * DynamicLayer.java:153-181 — a stored query starting with `{` is JSON,
  * anything else is CQL). The JSON matches a sub-graph rooted at the
  * geometry node:
  *
  * {{{
  * { "properties": {"type": "geometry"},
  *   "step": {"type": "GEOM", "direction": "INCOMING",
  *     "step": {"type": "TAGS", "direction": "OUTGOING",
  *       "properties": {"highway": "residential"}}}}
  * }}}
  *
  * Mapping onto this engine's flattened layer model: the graph hops the
  * reference walks at query time (geometry node → GEOM → way node → TAGS →
  * tags node) were already joined at ASSEMBLY time — an assembled way row
  * carries its geometry, its way attributes and its tag map in one row
  * (osm/OsmImport.assembleWays). Each JSON level's `properties` therefore
  * compile to predicates on that same row — top-level columns when one
  * exists, else the `props` map — and a `step` contributes its (validated)
  * type/direction plus its nested predicates, but no runtime join.
  *
  * Property-match semantics follow queryNodeProperties
  * (DynamicIndexReader.java:128-146) exactly: the property must EXIST on
  * the node; a null match value asserts existence only; otherwise values
  * compare by string conversion (the reference's Long!=Integer workaround).
  * A stray "geometry" key in `properties` is dropped, as the reference
  * does (:131-134).
  */
object DynamicLayerJson {

  private val Directions = Set("INCOMING", "OUTGOING", "BOTH")

  /** True when a stored dynamic-layer query is the JSON form (the
    * reference's `query.startsWith("{")` check, DynamicLayer.java:155). */
  def isJsonQuery(query: String): Boolean = query.trim.startsWith("{")

  /** Compile a stored JSON graph-step query into a filter Column over the
    * canonical layer schema. Throws IllegalArgumentException on malformed
    * queries (unknown direction, missing step type, non-object nodes).
    */
  def toColumn(json: String, topCols: Set[String]): Column = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(json)
    require(root != null && root.isObject,
      "dynamic-layer query must be a JSON object")
    compileNode(root, topCols)
  }

  private def compileNode(node: JsonNode, topCols: Set[String]): Column = {
    var c = lit(true)
    val props = node.get("properties")
    if (props != null) {
      require(props.isObject, "'properties' must be a JSON object")
      val it = props.fields()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey
        if (k != "geometry") { // reference drops a stray 'geometry' key
          val v = e.getValue
          val target =
            if (topCols.contains(k)) col(k)
            else if (topCols.contains("props")) col("props")(k)
            else lit(null)
          c = c && target.isNotNull &&
            (if (v.isNull) lit(true) else target.cast("string") === lit(v.asText))
        }
      }
    }
    val step = node.get("step")
    if (step != null) {
      require(step.isObject, "'step' must be a JSON object")
      val t = step.get("type")
      require(t != null && t.isTextual && t.asText.nonEmpty,
        "step needs a relationship 'type'")
      val dir = step.get("direction")
      if (dir != null)
        require(Directions.contains(dir.asText),
          s"unknown step direction '${dir.asText}'")
      c = c && compileNode(step, topCols)
    }
    c
  }
}
