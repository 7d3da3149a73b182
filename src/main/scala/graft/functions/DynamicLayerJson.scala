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
  * (osm/OsmImport.assembleWays). GEOM/TAGS levels therefore compile to
  * predicates on that same row — top-level columns when one exists, else
  * the `props` map.
  *
  * WAY-NODE CHAIN steps (reference model: way −FIRST_NODE→ proxy₀,
  * proxyₖ −NEXT→ proxyₖ₊₁, proxyₖ −NODE→ the OSM node,
  * OSMImporter.java:696-714) CANNOT compile to same-row predicates — the
  * node rows live in the `osm_way_nds`/`osm_nodes` staging tables. They
  * compile to a [[NodeChain]] spec that [[graft.osm.OsmImport.filterDynamic]]
  * executes as a semi-join against the staging tables. `getSingleRelationship`
  * semantics are preserved: a missing hop (stepping NEXT past the last
  * proxy, or INCOMING below the first) matches nothing; a non-empty
  * `properties` object on a proxy step matches nothing (proxy nodes carry
  * no properties in the reference model — the property-must-exist rule of
  * queryNodeProperties makes any test on them false).
  *
  * Property-match semantics follow queryNodeProperties
  * (DynamicIndexReader.java:128-146) exactly: the property must EXIST on
  * the node; a null match value asserts existence only; otherwise values
  * compare by string conversion (the reference's Long!=Integer workaround).
  * A stray "geometry" key in `properties` is dropped, as the reference
  * does (:131-134).
  *
  * Unsupported step types throw — the reference would walk an arbitrary
  * relationship name and silently match nothing or something else; here a
  * stored query outside the compiled surface fails LOUDLY instead of
  * over- or under-matching.
  */
object DynamicLayerJson {

  private val Directions = Set("INCOMING", "OUTGOING", "BOTH")
  /** Steps whose target data is already on the assembled way row. */
  private val SameRowSteps = Set("GEOM", "TAGS")
  /** Steps that walk the way-node chain (staging-table semi-join). */
  private val ChainSteps = Set("FIRST_NODE", "NEXT", "NODE")

  /** A compiled way-node chain: the way matches iff a proxy exists at
    * `seq` (every hop of the single-relationship walk existed) and — when
    * `atNode` — the OSM node referenced there passes `nodeProps`. `dead`
    * marks a chain that can never match (properties asserted on a
    * property-less proxy node, or a walk off either end of the chain).
    */
  case class NodeChain(seq: Int, atNode: Boolean,
      nodeProps: Seq[(String, Option[String])], dead: Boolean)

  /** Compile result: the same-row predicate plus an optional node chain
    * that needs the OSM staging tables to execute.
    */
  case class Compiled(rowPredicate: Column, chain: Option[NodeChain])

  /** True when a stored dynamic-layer query is the JSON form (the
    * reference's `query.startsWith("{")` check, DynamicLayer.java:155). */
  def isJsonQuery(query: String): Boolean = query.trim.startsWith("{")

  /** Compile a stored JSON graph-step query against the canonical layer
    * schema. Throws IllegalArgumentException on malformed queries
    * (unknown step type or direction, missing step type, non-object
    * nodes, steps nested beyond a NODE hop).
    */
  def compile(json: String, topCols: Set[String]): Compiled = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(json)
    require(root != null && root.isObject,
      "dynamic-layer query must be a JSON object")
    val state = new CompileState(topCols)
    state.walkSameRow(root)
    Compiled(state.pred, state.chain)
  }

  /** Column-only compile for chain-free queries. A query with way-node
    * chain steps throws: those need the staging tables
    * ([[graft.osm.OsmImport.filterDynamic]]) — failing loudly here is the
    * fix for the old behavior that compiled EVERY step to same-row
    * predicates and silently over-matched node-level queries.
    */
  def toColumn(json: String, topCols: Set[String]): Column = {
    val c = compile(json, topCols)
    c.chain.foreach { _ =>
      throw new IllegalArgumentException(
        "dynamic-layer query steps through the way-node chain " +
          "(FIRST_NODE/NEXT/NODE) — run it via OsmImport.filterDynamic, " +
          "which joins the osm_way_nds/osm_nodes staging tables")
    }
    c.rowPredicate
  }

  private class CompileState(topCols: Set[String]) {
    var pred: Column = lit(true)
    var chain: Option[NodeChain] = None

    /** Walk GEOM/TAGS levels (same-row), dispatch to walkChain at
      * FIRST_NODE. */
    def walkSameRow(node: JsonNode): Unit = {
      pred = pred && propsPredicate(node)
      stepOf(node).foreach { step =>
        val (t, _) = stepTypeDir(step)
        if (SameRowSteps.contains(t)) walkSameRow(step)
        else if (t == "FIRST_NODE") walkChain(step, seq = 0)
        else if (ChainSteps.contains(t)) throw new IllegalArgumentException(
          s"step '$t' is only valid after FIRST_NODE (way-node chain)")
        else throw new IllegalArgumentException(
          s"unsupported step type '$t' — supported: GEOM, TAGS, " +
            "FIRST_NODE, NEXT, NODE")
      }
    }

    /** Walk FIRST_NODE/NEXT/NODE hops, accumulating the chain spec. */
    private def walkChain(node: JsonNode, seq: Int): Unit = {
      // a non-empty properties object on a proxy step: proxies carry no
      // properties, and queryNodeProperties requires existence ⇒ dead
      val proxyProps = literalProps(node)
      val deadProxy = proxyProps.nonEmpty
      stepOf(node) match {
        case None =>
          chain = Some(NodeChain(seq, atNode = false, Nil,
            dead = deadProxy || seq < 0))
        case Some(step) =>
          val (t, dir) = stepTypeDir(step)
          t match {
            case "NEXT" =>
              val d = dir.getOrElse("OUTGOING")
              if (d == "BOTH") throw new IllegalArgumentException(
                "NEXT with direction BOTH is ambiguous (a middle proxy has " +
                  "two NEXT relationships — getSingleRelationship throws)")
              walkChain(step, if (d == "OUTGOING") seq + 1 else seq - 1)
              if (deadProxy) chain = chain.map(_.copy(dead = true))
            case "NODE" =>
              if (stepOf(step).nonEmpty) throw new IllegalArgumentException(
                "steps nested beyond a NODE hop are not supported")
              chain = Some(NodeChain(seq, atNode = true, literalProps(step),
                dead = deadProxy || seq < 0))
            case other => throw new IllegalArgumentException(
              s"unsupported step type '$other' inside the way-node chain — " +
                "expected NEXT or NODE")
          }
      }
    }

    /** Same-row predicate from a level's properties (queryNodeProperties
      * semantics over top columns / the props map). */
    private def propsPredicate(node: JsonNode): Column = {
      var c = lit(true)
      literalProps(node).foreach { case (k, v) =>
        val target =
          if (topCols.contains(k)) col(k)
          else if (topCols.contains("props")) col("props")(k)
          else lit(null)
        c = c && target.isNotNull &&
          (v match {
            case None => lit(true)
            case Some(s) => target.cast("string") === lit(s)
          })
      }
      c
    }

    /** Extract a level's properties as (key, Option[stringValue]) pairs —
      * None asserts existence only; the stray "geometry" key is dropped. */
    private def literalProps(node: JsonNode): Seq[(String, Option[String])] = {
      val props = node.get("properties")
      if (props == null) return Nil
      require(props.isObject, "'properties' must be a JSON object")
      val out = Seq.newBuilder[(String, Option[String])]
      val it = props.fields()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey != "geometry")
          out += ((e.getKey,
            if (e.getValue.isNull) None else Some(e.getValue.asText)))
      }
      out.result()
    }

    private def stepOf(node: JsonNode): Option[JsonNode] = {
      val s = node.get("step")
      if (s == null) None
      else { require(s.isObject, "'step' must be a JSON object"); Some(s) }
    }

    private def stepTypeDir(step: JsonNode): (String, Option[String]) = {
      val t = step.get("type")
      require(t != null && t.isTextual && t.asText.nonEmpty,
        "step needs a relationship 'type'")
      val dir = Option(step.get("direction")).map(_.asText)
      dir.foreach(d => require(Directions.contains(d),
        s"unknown step direction '$d'"))
      (t.asText.toUpperCase, dir)
    }
  }
}
