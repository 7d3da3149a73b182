package graft.sources

/** robots.txt parsing + matching per the public REP spec (RFC 9309 /
  * Google's documented semantics): group selection by user-agent token
  * (exact match preferred, `*` group otherwise), longest-rule-wins
  * precedence with Allow winning ties, `*` wildcards and a `$` end anchor
  * in rule paths. The politeness gate a crawl pipeline applies beside URL
  * canonicalization.
  */
object Robots {

  /** One Allow/Disallow rule. `pattern` may contain `*` wildcards and a
    * trailing `$` anchor; precedence is by pattern length (spec:
    * "most specific rule, based on the length of the [path] entry").
    */
  final case class Rule(allow: Boolean, pattern: String) {
    private[Robots] val rx: java.util.regex.Pattern = {
      val anchored = pattern.endsWith("$")
      val body = if (anchored) pattern.dropRight(1) else pattern
      val quoted = body.split("\\*", -1)
        .map(java.util.regex.Pattern.quote).mkString(".*")
      java.util.regex.Pattern.compile(
        "^" + quoted + (if (anchored) "$" else ""))
    }
    def matches(path: String): Boolean = rx.matcher(path).lookingAt()
    def specificity: Int = pattern.length
  }

  /** Parse `robots.txt` text and return the rules applying to `agent`:
    * the union of groups whose user-agent token equals `agent`
    * (case-insensitive) if any exist, else the `*` groups. Lines other
    * than user-agent/allow/disallow (crawl-delay, sitemap, comments) are
    * ignored, matching crawler behavior.
    */
  def parse(txt: String, agent: String = "*"): Seq[Rule] = {
    final case class Group(agents: List[String], rules: List[Rule])
    var groups = List.empty[Group]
    var curAgents = List.empty[String]
    var curRules = List.empty[Rule]
    var inRules = false
    def flush(): Unit = {
      if (curAgents.nonEmpty) groups :+= Group(curAgents, curRules)
      curAgents = Nil; curRules = Nil; inRules = false
    }
    txt.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) flush()
            curAgents :+= value.toLowerCase
          case "allow" | "disallow" =>
            inRules = true
            // empty Disallow = allow everything (classic form): no rule
            if (value.nonEmpty)
              curRules :+= Rule(allow = key == "allow", value)
          case _ => if (curAgents.nonEmpty) inRules = true
        }
      }
    }
    flush()
    val a = agent.toLowerCase
    val exact = groups.filter(_.agents.contains(a))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules)
  }

  /** Is `path` fetchable under `rules`? Longest matching rule wins; an
    * Allow beats a Disallow of equal length; no matching rule → allowed.
    */
  def allowed(rules: Seq[Rule], path: String): Boolean = {
    val m = rules.filter(_.matches(path))
    if (m.isEmpty) true
    else {
      val best = m.maxBy(r => (r.specificity, r.allow))
      best.allow
    }
  }
}
