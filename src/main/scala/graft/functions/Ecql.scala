package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.geom.GeomCodec

/** ECQL → Column translator for the subset the reference's CQL surface
  * actually exercises (reference: filter/SearchCQL.java:27-60 feeds any
  * ECQL string to GeoTools `ECQL.toFilter`; the strings the reference's
  * own code and tests generate are attribute comparisons, IS [NOT] NULL,
  * AND/OR/NOT, `geometryType(the_geom) = 'X'` — DynamicLayer.java:106-137 —
  * and the spatial operators BBOX / INTERSECTS / …, whose envelope the
  * engine extracts for index pruning, Utilities.java:65-119).
  *
  * A stored ECQL string from the reference therefore runs verbatim:
  * `spatial.cql` tries this parser first and falls back to Spark SQL
  * (the documented superset) when the string is not ECQL.
  *
  * Mapping onto the canonical layer schema:
  *  - `the_geom` (or `geometry`) → the WKB `geometry` column
  *  - a bare identifier resolves to a top-level column when one exists,
  *    else to `props[name]` (the reference's dynamic property lookup);
  *    props comparisons against numeric literals cast to double
  *  - spatial predicates emit the same bbox-prune && exact-JTS conjunct
  *    pair as the API searches, so Catalyst pushes the envelope to the
  *    scan exactly like `needsToVisit` pruned the R-tree walk
  *  - DWITHIN honors its units token: degrees (or any unrecognized token,
  *    like GeoTools on a geographic CRS) keeps the planar layer-CRS
  *    semantics; `meters`/`kilometers` route through the geodesic tier —
  *    exact orthodromic distance with the latitude-aware search window as
  *    the bbox prune (POINT literals; the reference's withinDistance is
  *    point-centric too)
  */
object Ecql {

  // ------------------------------------------------------------- tokenizer

  private sealed trait Tok
  private case class TIdent(s: String) extends Tok   // uppercased for keywords
  private case class TStr(s: String) extends Tok
  private case class TNum(s: String) extends Tok
  private case class TSym(s: String) extends Tok
  private case class TDate(s: String) extends Tok    // ISO-8601 instant/date

  // ISO instant at the head of the remaining input: date, optional time,
  // optional zone. Matched BEFORE the number lexer so `2006-11-30` is a
  // date literal, not a subtraction — the GeoTools lexer's precedence.
  private val DateRe =
    """\d{4}-\d{2}-\d{2}(T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?)?""".r

  private val WktTypes = Set("POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
    "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION")

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    // '-' is a SIGN only when it cannot be a binary operator — i.e. the
    // previous token is not a value/closing-paren (so `a - 1` subtracts
    // while `a < -1` negates)
    var prevValue = false
    def add(t: Tok): Unit = {
      prevValue = t match {
        case TIdent(_) | TNum(_) | TStr(_) | TDate(_) | TSym(")") => true
        case _ => false
      }
      out += t
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done) {
          if (i >= n) throw new IllegalArgumentException("unterminated string literal")
          val ch = s.charAt(i)
          if (ch == '\'') {
            if (i + 1 < n && s.charAt(i + 1) == '\'') { sb.append('\''); i += 2 }
            else { done = true; i += 1 }
          } else { sb.append(ch); i += 1 }
        }
        add(TStr(sb.toString))
      } else if (c.isDigit && DateRe.findPrefixMatchOf(s.substring(i)).isDefined) {
        val m = DateRe.findPrefixMatchOf(s.substring(i)).get
        add(TDate(m.matched))
        i += m.end
      } else if (c.isDigit ||
          (c == '-' && !prevValue && i + 1 < n && s.charAt(i + 1).isDigit)) {
        val start = i
        i += 1
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
          s.charAt(i) == 'e' || s.charAt(i) == 'E' ||
          ((s.charAt(i) == '-' || s.charAt(i) == '+') &&
            (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) i += 1
        add(TNum(s.substring(start, i)))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        add(TIdent(s.substring(start, i)))
      } else if (c == '<' && i + 1 < n && (s.charAt(i + 1) == '>' || s.charAt(i + 1) == '=')) {
        add(TSym(s.substring(i, i + 2))); i += 2
      } else if (c == '>' && i + 1 < n && s.charAt(i + 1) == '=') {
        add(TSym(">=")); i += 2
      } else if ("()=<>,+-*/".indexOf(c) >= 0) {
        add(TSym(c.toString)); i += 1
      } else throw new IllegalArgumentException(s"unexpected character '$c' in ECQL")
    }
    out.result()
  }

  // ---------------------------------------------------------------- parser

  /** Operand: a resolved column plus enough shape info to coerce props. */
  private sealed trait Operand
  private case class PropOp(name: String) extends Operand
  private case class GeomOp(dummy: Boolean = true) extends Operand
  private case class GeomTypeOp(dummy: Boolean = true) extends Operand
  private case class StrOp(v: String) extends Operand
  private case class NumOp(v: Double) extends Operand
  private case class BoolOp(v: Boolean) extends Operand
  private case class ArithOp(c: Column) extends Operand  // +,-,*,/ over operands
  private case class FnOp(c: Column, numeric: Boolean) extends Operand // filter-function call
  private case class TimeOp(v: java.sql.Timestamp) extends Operand

  /** ISO instant → UTC timestamp: offset honored when present, date-only =
    * midnight UTC (the GeoTools temporal-literal reading).
    */
  private def parseInstant(s: String): java.sql.Timestamp = {
    import java.time._
    val inst =
      if (!s.contains('T'))
        LocalDate.parse(s).atStartOfDay.toInstant(ZoneOffset.UTC)
      else
        try OffsetDateTime.parse(s).toInstant
        catch { case _: format.DateTimeParseException =>
          LocalDateTime.parse(s).toInstant(ZoneOffset.UTC)
        }
    java.sql.Timestamp.from(inst)
  }

  /** GeoTools filter-function library subset (FunctionFinder lookup is
    * case-insensitive): name → (numeric-args?, builder, numeric-result?).
    */
  private val Fns: Map[String, (Boolean, Seq[Column] => Column, Boolean)] = Map(
    "strtolowercase" -> ((false, (as: Seq[Column]) => lower(as.head), false)),
    "strtouppercase" -> ((false, (as: Seq[Column]) => upper(as.head), false)),
    "strtrim" -> ((false, (as: Seq[Column]) => trim(as.head), false)),
    "strconcat" -> ((false, (as: Seq[Column]) => concat(as: _*), false)),
    "strlength" -> ((false,
      (as: Seq[Column]) => length(as.head).cast("double"), true)),
    // round-9 tail: the rest of the FunctionFinder names ECQL meets in
    // stored filters. String indexes are 0-based begin-inclusive /
    // end-exclusive (GeoTools StringInFunction semantics); strIndexOf is
    // -1-when-absent like String.indexOf.
    "strcapitalize" -> ((false, (as: Seq[Column]) => initcap(as.head), false)),
    "strsubstring" -> ((false, (as: Seq[Column]) =>
      as.head.substr(as(1).cast("int") + 1,
        as(2).cast("int") - as(1).cast("int")), false)),
    "strsubstringstart" -> ((false, (as: Seq[Column]) =>
      as.head.substr(as(1).cast("int") + 1, lit(Int.MaxValue)), false)),
    "strindexof" -> ((false, (as: Seq[Column]) =>
      (call_function("instr", as.head, as(1)) - 1).cast("double"), true)),
    "strmatches" -> ((false, (as: Seq[Column]) =>
      call_function("regexp_like", as.head, as(1)), false)),
    "strstartswith" -> ((false, (as: Seq[Column]) =>
      call_function("startswith", as.head, as(1)), false)),
    "strendswith" -> ((false, (as: Seq[Column]) =>
      call_function("endswith", as.head, as(1)), false)),
    "strequalsignorecase" -> ((false, (as: Seq[Column]) =>
      lower(as.head) === lower(as(1)), false)),
    "abs" -> ((true, (as: Seq[Column]) => abs(as.head), true)),
    "ceil" -> ((true, (as: Seq[Column]) => ceil(as.head).cast("double"), true)),
    "floor" -> ((true, (as: Seq[Column]) => floor(as.head).cast("double"), true)),
    "round" -> ((true,
      (as: Seq[Column]) => round(as.head, 0).cast("double"), true)),
    "min" -> ((true, (as: Seq[Column]) => least(as.head, as(1)), true)),
    "max" -> ((true, (as: Seq[Column]) => greatest(as.head, as(1)), true)),
    "pow" -> ((true, (as: Seq[Column]) => pow(as.head, as(1)), true)),
    "sqrt" -> ((true, (as: Seq[Column]) => sqrt(as.head), true)),
    "exp" -> ((true, (as: Seq[Column]) => exp(as.head), true)),
    // GeoTools log is the NATURAL log (java.lang.Math.log)
    "log" -> ((true, (as: Seq[Column]) => log(as.head), true)),
    "sin" -> ((true, (as: Seq[Column]) => sin(as.head), true)),
    "cos" -> ((true, (as: Seq[Column]) => cos(as.head), true)),
    "tan" -> ((true, (as: Seq[Column]) => tan(as.head), true)),
    "asin" -> ((true, (as: Seq[Column]) => asin(as.head), true)),
    "acos" -> ((true, (as: Seq[Column]) => acos(as.head), true)),
    "atan" -> ((true, (as: Seq[Column]) => atan(as.head), true)),
    "atan2" -> ((true, (as: Seq[Column]) => atan2(as.head, as(1)), true)),
    "pi" -> ((true, (_: Seq[Column]) => lit(math.Pi), true)))

  private class Parser(toks: Vector[Tok], topCols: Set[String]) {
    private var pos = 0
    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def isKw(t: Tok, kw: String): Boolean = t match {
      case TIdent(s) => s.equalsIgnoreCase(kw)
      case _ => false
    }
    private def takeKw(kw: String): Boolean =
      peek.exists(isKw(_, kw)) && { pos += 1; true }
    private def expectSym(sym: String): Unit = next() match {
      case TSym(`sym`) =>
      case other => throw new IllegalArgumentException(s"expected '$sym', got $other")
    }
    def atEnd: Boolean = pos >= toks.length

    def parseExpr(): Column = {
      var l = parseAnd()
      while (takeKw("OR")) l = l || parseAnd()
      l
    }
    private def parseAnd(): Column = {
      var l = parseNot()
      while (takeKw("AND")) l = l && parseNot()
      l
    }
    private def parseNot(): Column =
      if (takeKw("NOT")) !parseNot()
      else parsePrimary()

    private val SpatialPreds = Map(
      "INTERSECTS" -> "intersects", "WITHIN" -> "within",
      "CONTAINS" -> "contains", "TOUCHES" -> "touches",
      "CROSSES" -> "crosses", "OVERLAPS" -> "overlaps",
      "DISJOINT" -> "disjoint")

    private def parsePrimary(): Column = peek match {
      // GeoTools CQL match-all / match-none filter keywords
      case Some(TIdent(id)) if id.equalsIgnoreCase("INCLUDE") =>
        next(); lit(true)
      case Some(TIdent(id)) if id.equalsIgnoreCase("EXCLUDE") =>
        next(); lit(false)
      case Some(TSym("(")) =>
        next(); val e = parseExpr(); expectSym(")"); e
      case Some(TIdent(id)) if id.equalsIgnoreCase("BBOX") =>
        next(); expectSym("(")
        parseOperand() match {
          case GeomOp(_) =>
          case other => throw new IllegalArgumentException(s"BBOX needs the geometry property, got $other")
        }
        expectSym(",")
        val nums = (1 to 4).map { k =>
          val v = parseNum(); if (k < 4) expectSym(",") ; v
        }
        // optional trailing CRS literal, ignored (WGS84-only surface)
        if (peek.contains(TSym(","))) { next(); next() }
        expectSym(")")
        st.bboxIntersects(col("bbox"), nums(0), nums(1), nums(2), nums(3))
      case Some(TIdent(id))
          if SpatialPreds.contains(id.toUpperCase) || id.equalsIgnoreCase("EQUALS") =>
        val kw = next().asInstanceOf[TIdent].s.toUpperCase
        expectSym("(")
        val a = parseOperand(); expectSym(","); val b = parseOperand(); expectSym(")")
        val wkt = (a, b) match {
          case (GeomOp(_), StrOp(w)) => w
          case (StrOp(w), GeomOp(_)) => w
          case other => throw new IllegalArgumentException(
            s"$kw needs (geometry property, geometry literal), got $other")
        }
        val g = GeomCodec.fromWkt(wkt)
        val e = g.getEnvelopeInternal
        if (kw == "EQUALS")
          st.bboxIntersects(col("bbox"), e.getMinX, e.getMinY, e.getMaxX, e.getMaxY) &&
            st.equalsTopo(col("geometry"), lit(GeomCodec.toWkb(g)))
        else if (kw == "DISJOINT")
          // disjoint has no envelope prune (its matches are everywhere)
          !(st.bboxIntersects(col("bbox"), e.getMinX, e.getMinY, e.getMaxX, e.getMaxY) &&
            STPredicate.column("intersects", col("geometry"), g))
        else
          st.bboxIntersects(col("bbox"), e.getMinX, e.getMinY, e.getMaxX, e.getMaxY) &&
            STPredicate.column(SpatialPreds(kw), col("geometry"), g)
      // GeoTools ECQL ID filter: a bare `IN ('fid1', 'fid2', …)` at
      // predicate position selects by feature id (no left attribute). The
      // canonical layer schema carries the feature id in `id`.
      case Some(TIdent(id)) if id.equalsIgnoreCase("IN") &&
          pos + 1 < toks.length && toks(pos + 1) == TSym("(") =>
        next(); expectSym("(")
        if (!topCols.contains("id")) throw new IllegalArgumentException(
          "ID filter needs an `id` column on this layer")
        val ids = scala.collection.mutable.ArrayBuffer[String]()
        def takeId(): Unit = next() match {
          case TStr(v) => ids += v
          case TNum(v) => ids += v   // numeric fids tokenize as numbers
          case other => throw new IllegalArgumentException(
            s"ID filter needs literal feature ids, got $other")
        }
        takeId()
        while (peek.contains(TSym(","))) { next(); takeId() }
        expectSym(")")
        col("id").isin(ids.toSeq: _*)
      // DE-9IM pattern predicate: RELATE(the_geom, <wkt literal>, pattern)
      // — compiled to the exact relate with NO bbox prune conjunct (a
      // general pattern can demand disjointness, so an envelope prune
      // would be unsound; GeoTools evaluates RELATE exactly too)
      case Some(TIdent(id)) if id.equalsIgnoreCase("RELATE") =>
        next(); expectSym("(")
        parseOperand() match {
          case GeomOp(_) =>
          case other => throw new IllegalArgumentException(
            s"RELATE needs the geometry property first, got $other")
        }
        expectSym(",")
        val wkt = parseOperand() match {
          case StrOp(w) => w
          case other => throw new IllegalArgumentException(
            s"RELATE needs a geometry literal, got $other")
        }
        expectSym(",")
        // pattern: quoted string, or the bare GeoTools form (T/F/0/1/2/*
        // tokens interleaved with '*' symbols) concatenated up to ')'
        val pat = peek match {
          case Some(TStr(p)) => next(); p
          case _ =>
            val sb = new StringBuilder
            while (!peek.contains(TSym(")"))) {
              next() match {
                case TIdent(s) => sb.append(s)
                case TNum(s) => sb.append(s)
                case TSym("*") => sb.append('*')
                case other => throw new IllegalArgumentException(
                  s"bad DE-9IM pattern token $other")
              }
            }
            sb.toString
        }
        expectSym(")")
        require(pat.length == 9 && pat.forall(c => "TF012*".contains(c)),
          s"DE-9IM pattern must be 9 of [TF012*], got '$pat'")
        val g = GeomCodec.fromWkt(wkt)
        st.relatePattern(col("geometry"), lit(GeomCodec.toWkb(g)), lit(pat))
      case Some(TIdent(id)) if id.equalsIgnoreCase("DWITHIN") =>
        next(); expectSym("(")
        parseOperand() match {
          case GeomOp(_) =>
          case other => throw new IllegalArgumentException(s"DWITHIN needs the geometry property, got $other")
        }
        expectSym(",")
        val wkt = parseOperand() match {
          case StrOp(w) => w
          case other => throw new IllegalArgumentException(s"DWITHIN needs a geometry literal, got $other")
        }
        expectSym(",")
        val d = parseNum()
        expectSym(",")
        val units = next() match {
          case TIdent(u) => u.toLowerCase
          case TStr(u) => u.toLowerCase
          case other => throw new IllegalArgumentException(s"expected units token, got $other")
        }
        expectSym(")")
        val g = GeomCodec.fromWkt(wkt)
        units match {
          case "meters" | "metres" | "m" | "kilometers" | "kilometres" | "km" =>
            val km = if (units.startsWith("k")) d else d / 1000.0
            val p = g match {
              case pt: org.locationtech.jts.geom.Point => pt
              case other => throw new IllegalArgumentException(
                s"DWITHIN with metric units needs a POINT literal, got ${other.getGeometryType}")
            }
            val w = graft.geom.Orthodromic.searchWindow(p.getX, p.getY, km)
            val dist =
              if (topCols.contains("x") && topCols.contains("y"))
                // point layer: pure column arithmetic, full codegen
                st.orthodromicKm(lit(p.getX), lit(p.getY), col("x"), col("y"))
              else st.orthodromicDistanceKm(col("geometry"), p.getX, p.getY)
            st.bboxIntersectsWrapped(col("bbox"),
              w.getMinX, w.getMinY, w.getMaxX, w.getMaxY) && dist <= km
          case _ =>
            // degrees / unrecognized: planar layer-CRS distance (GeoTools
            // behavior on a geographic CRS)
            val e = g.getEnvelopeInternal
            st.bboxIntersects(col("bbox"),
              e.getMinX - d, e.getMinY - d, e.getMaxX + d, e.getMaxY + d) &&
              st.distance(col("geometry"), lit(GeomCodec.toWkb(g))) <= d
        }
      case _ => parseComparison()
    }

    private def parseNum(): Double = next() match {
      case TNum(v) => v.toDouble
      case other => throw new IllegalArgumentException(s"expected number, got $other")
    }

    private def parseOperand(): Operand = peek match {
      case Some(TDate(d)) =>
        next(); TimeOp(parseInstant(d))
      case Some(TIdent(id)) if WktTypes.contains(id.toUpperCase) =>
        // inline WKT literal: consume ident + balanced parens verbatim
        next()
        val sb = new StringBuilder(id.toUpperCase)
        expectSym("(")
        sb.append(" (")
        var depth = 1
        while (depth > 0) {
          next() match {
            case TSym("(") => depth += 1; sb.append("(")
            case TSym(")") => depth -= 1; sb.append(")")
            case TSym(",") => sb.append(", ")
            // a '-' after a number tokenizes as a symbol (binary minus);
            // inside a WKT literal it is always the sign of the next coord
            case TSym("-") => next() match {
              case TNum(v) =>
                if (sb.last.isDigit) sb.append(" "); sb.append("-").append(v)
              case other => throw new IllegalArgumentException(s"bad WKT literal token $other")
            }
            case TNum(v) => if (sb.last.isDigit) sb.append(" "); sb.append(v)
            case other => throw new IllegalArgumentException(s"bad WKT literal token $other")
          }
        }
        StrOp(sb.toString)
      case Some(TIdent(id)) if id.equalsIgnoreCase("geometryType") =>
        next(); expectSym("(")
        parseOperand() match {
          case GeomOp(_) =>
          case other => throw new IllegalArgumentException(s"geometryType needs the geometry property, got $other")
        }
        expectSym(")")
        GeomTypeOp()
      case Some(TIdent(id)) if id.equalsIgnoreCase("TRUE") => next(); BoolOp(true)
      case Some(TIdent(id)) if id.equalsIgnoreCase("FALSE") => next(); BoolOp(false)
      // GeoTools filter-function library, the most-used string/math names
      // (ECQL compiles them through FunctionFinder; same case-insensitive
      // lookup here). String args use the resolved column (props values
      // are already strings); numeric args coerce through the numeric
      // path so props cast to double.
      // strReplace is parsed apart from the registry: its global flag is a
      // LITERAL we must inspect — the non-global (replace-first) form has
      // no clean columnar build, so it fails loudly instead of silently
      // replacing all occurrences
      case Some(TIdent(id)) if id.equalsIgnoreCase("strReplace") &&
          pos + 1 < toks.length && toks(pos + 1) == TSym("(") =>
        next(); expectSym("(")
        val s = parseArith(); expectSym(",")
        val pat = parseArith(); expectSym(",")
        val repl = parseArith()
        val global =
          if (peek.contains(TSym(","))) { next(); parseOperand() }
          else BoolOp(true)
        expectSym(")")
        global match {
          case BoolOp(true) =>
          case other => throw new IllegalArgumentException(
            s"strReplace: only the global (TRUE) form is supported, got $other")
        }
        FnOp(call_function("regexp_replace",
          operandCol(s), operandCol(pat), operandCol(repl)), numeric = false)
      case Some(TIdent(id)) if Fns.contains(id.toLowerCase) &&
          pos + 1 < toks.length && toks(pos + 1) == TSym("(") =>
        next(); expectSym("(")
        val args = scala.collection.mutable.ArrayBuffer[Operand]()
        if (!peek.contains(TSym(")"))) {
          args += parseArith()
          while (peek.contains(TSym(","))) { next(); args += parseArith() }
        }
        expectSym(")")
        val (numArgs, build, numOut) = Fns(id.toLowerCase)
        val cols = args.toSeq.map(a => if (numArgs) numericCol(a) else operandCol(a))
        FnOp(build(cols), numeric = numOut)
      case Some(TIdent(id)) =>
        next()
        if (id.equalsIgnoreCase("the_geom") || id.equalsIgnoreCase("geometry")) GeomOp()
        else PropOp(id)
      case Some(TStr(v)) => next(); StrOp(v)
      case Some(TNum(v)) => next(); NumOp(v.toDouble)
      case other => throw new IllegalArgumentException(s"expected operand, got $other")
    }

    private def propCol(name: String): Column =
      if (topCols.contains(name)) col(name)
      else if (topCols.contains("props")) col("props")(name)
      else throw new IllegalArgumentException(
        s"unknown property $name (no props map on this layer)")

    /** props values are strings; comparisons against numeric literals
      * compare numerically (the reference's feature attributes are typed —
      * our map-backed dynamic props need the cast).
      */
    private def sides(a: Operand, b: Operand): (Column, Column) = (a, b) match {
      case (PropOp(p), NumOp(_) | ArithOp(_)) if !topCols.contains(p) =>
        (propCol(p).cast("double"), operandCol(b))
      case (NumOp(_) | ArithOp(_), PropOp(p)) if !topCols.contains(p) =>
        (operandCol(a), propCol(p).cast("double"))
      case (_, TimeOp(_)) => (tcol(a), operandCol(b))
      case (TimeOp(_), _) => (operandCol(a), tcol(b))
      case _ => (operandCol(a), operandCol(b))
    }

    /** Operand in a temporal context: coerced to timestamp (no-op for a
      * true timestamp column; ISO strings — the props map or string layers
      * — parse under the session's UTC zone).
      */
    private def tcol(o: Operand): Column = o match {
      case TimeOp(v) => lit(v)
      case other => operandCol(other).cast("timestamp")
    }

    /** Instant (Left) or instant/instant period (Right) after BEFORE/AFTER. */
    private def parseTemporalRhs(): Either[java.sql.Timestamp,
        (java.sql.Timestamp, java.sql.Timestamp)] = next() match {
      case TDate(d) =>
        if (peek.contains(TSym("/"))) {
          next()
          next() match {
            case TDate(d2) => Right((parseInstant(d), parseInstant(d2)))
            case other => throw new IllegalArgumentException(
              s"period needs instant/instant (ISO durations unsupported), got $other")
          }
        } else Left(parseInstant(d))
      case other => throw new IllegalArgumentException(
        s"temporal predicate needs an ISO instant, got $other")
    }

    private def parsePeriod(): (java.sql.Timestamp, java.sql.Timestamp) =
      parseTemporalRhs() match {
        case Right(p) => p
        case Left(_) => throw new IllegalArgumentException(
          "expected a period (instant/instant)")
      }

    private def operandCol(o: Operand): Column = o match {
      case PropOp(p) => propCol(p)
      case GeomOp(_) => col("geometry")
      case GeomTypeOp(_) => st.geometryType(col("geometry"))
      case StrOp(v) => lit(v)
      case NumOp(v) => lit(v)
      case BoolOp(v) => lit(v)
      case TimeOp(v) => lit(v)
      case ArithOp(c) => c
      case FnOp(c, _) => c
    }

    /** Operand in a numeric context: untyped props cast to double. */
    private def numericCol(o: Operand): Column = o match {
      case PropOp(p) if !topCols.contains(p) => propCol(p).cast("double")
      case PropOp(p) => col(p)
      case NumOp(v) => lit(v)
      case ArithOp(c) => c
      case FnOp(c, true) => c
      case FnOp(c, false) => c.cast("double")
      case other => throw new IllegalArgumentException(
        s"expected numeric operand in arithmetic, got $other")
    }

    private def isArithSym(t: Tok, ops: String): Boolean = t match {
      case TSym(sym) => sym.length == 1 && ops.contains(sym)
      case _ => false
    }

    /** additive ::= multiplicative {(+|-) multiplicative} — GeoTools ECQL
      * allows arithmetic inside comparisons (`a * 2 + 1 < b`). Returns the
      * plain operand when no operator is consumed, so non-numeric
      * comparisons (strings, geometryType) are untouched.
      */
    private def parseArith(): Operand = {
      var a = parseMul()
      while (peek.exists(isArithSym(_, "+-"))) {
        val op = next().asInstanceOf[TSym].s
        val b = parseMul()
        a = ArithOp(if (op == "+") numericCol(a) + numericCol(b)
                    else numericCol(a) - numericCol(b))
      }
      a
    }
    private def parseMul(): Operand = {
      var a = parseOperand()
      while (peek.exists(isArithSym(_, "*/"))) {
        val op = next().asInstanceOf[TSym].s
        val b = parseOperand()
        a = ArithOp(if (op == "*") numericCol(a) * numericCol(b)
                    else numericCol(a) / numericCol(b))
      }
      a
    }

    private def parseComparison(): Column = {
      val a = parseArith()
      peek match {
        case Some(TIdent(kw)) if kw.equalsIgnoreCase("IS") =>
          next()
          val notNull = takeKw("NOT")
          if (!takeKw("NULL"))
            throw new IllegalArgumentException("expected NULL after IS [NOT]")
          if (notNull) operandCol(a).isNotNull else operandCol(a).isNull
        case Some(TIdent(kw)) if kw.equalsIgnoreCase("LIKE") =>
          next()
          next() match {
            case TStr(p) => operandCol(a).like(p)
            case other => throw new IllegalArgumentException(s"LIKE needs a string pattern, got $other")
          }
        case Some(TIdent(kw)) if kw.equalsIgnoreCase("NOT") =>
          next()
          if (takeKw("LIKE")) next() match {
            case TStr(p) => !operandCol(a).like(p)
            case other => throw new IllegalArgumentException(s"NOT LIKE needs a string pattern, got $other")
          }
          else if (takeKw("BETWEEN")) {
            val lo = parseArith()
            if (!takeKw("AND")) throw new IllegalArgumentException("BETWEEN needs AND")
            val hi = parseArith()
            val (ca, cl) = sides(a, lo); val (_, ch) = sides(a, hi)
            !(ca >= cl && ca <= ch)
          }
          else if (takeKw("IN")) {
            expectSym("(")
            val vals = scala.collection.mutable.ArrayBuffer[Operand](parseArith())
            while (peek.contains(TSym(","))) { next(); vals += parseArith() }
            expectSym(")")
            !vals.map(v => { val (ca, cv) = sides(a, v); ca === cv }).reduce(_ || _)
          }
          else throw new IllegalArgumentException("expected LIKE, BETWEEN or IN after NOT")
        case Some(TIdent(kw)) if kw.equalsIgnoreCase("BETWEEN") =>
          next()
          val lo = parseArith()
          if (!takeKw("AND")) throw new IllegalArgumentException("BETWEEN needs AND")
          val hi = parseArith()
          val (ca, cl) = sides(a, lo); val (_, ch) = sides(a, hi)
          ca >= cl && ca <= ch
        case Some(TIdent(kw)) if kw.equalsIgnoreCase("IN") =>
          next(); expectSym("(")
          val vals = scala.collection.mutable.ArrayBuffer[Operand](parseArith())
          while (peek.contains(TSym(","))) { next(); vals += parseArith() }
          expectSym(")")
          vals.map(v => { val (ca, cv) = sides(a, v); ca === cv }).reduce(_ || _)
        // FES temporal predicates, GeoTools ECQL compilation: BEFORE
        // instant ⇒ <, AFTER instant ⇒ >, BEFORE period ⇒ < start, AFTER
        // period ⇒ > end, DURING ⇒ strictly inside, BEFORE OR DURING ⇒
        // <= end, DURING OR AFTER ⇒ >= start. Periods are instant/instant;
        // ISO-duration endpoints throw (callers fall back to Spark SQL).
        case Some(TIdent(kw)) if kw.equalsIgnoreCase("BEFORE") =>
          next()
          if (takeKw("OR")) {
            if (!takeKw("DURING"))
              throw new IllegalArgumentException("expected DURING after BEFORE OR")
            val (_, e) = parsePeriod()
            tcol(a) <= lit(e)
          } else parseTemporalRhs() match {
            case Left(t) => tcol(a) < lit(t)
            case Right((st0, _)) => tcol(a) < lit(st0)
          }
        case Some(TIdent(kw)) if kw.equalsIgnoreCase("AFTER") =>
          next()
          parseTemporalRhs() match {
            case Left(t) => tcol(a) > lit(t)
            case Right((_, e)) => tcol(a) > lit(e)
          }
        case Some(TIdent(kw)) if kw.equalsIgnoreCase("DURING") =>
          next()
          if (takeKw("OR")) {
            if (!takeKw("AFTER"))
              throw new IllegalArgumentException("expected AFTER after DURING OR")
            val (st0, _) = parsePeriod()
            tcol(a) >= lit(st0)
          } else {
            val (st0, e) = parsePeriod()
            tcol(a) > lit(st0) && tcol(a) < lit(e)
          }
        case Some(TSym(op)) if Set("=", "<>", "<", "<=", ">", ">=")(op) =>
          next()
          val b = parseArith()
          val (ca, cb) = sides(a, b)
          op match {
            case "=" => ca === cb
            case "<>" => ca =!= cb
            case "<" => ca < cb
            case "<=" => ca <= cb
            case ">" => ca > cb
            case ">=" => ca >= cb
          }
        case other => throw new IllegalArgumentException(s"expected comparison after operand, got $other")
      }
    }
  }

  /** Parse an ECQL filter into a Column over the canonical layer schema.
    * `topCols` are the layer's top-level columns (anything else resolves
    * through the props map). Throws IllegalArgumentException on anything
    * outside the supported subset — callers fall back to Spark SQL.
    */
  def toColumn(ecql: String, topCols: Set[String]): Column = {
    val p = new Parser(tokenize(ecql), topCols)
    val c = p.parseExpr()
    if (!p.atEnd) throw new IllegalArgumentException("trailing tokens in ECQL")
    c
  }

  /** True if the string parses as the supported ECQL subset. */
  def parses(ecql: String, topCols: Set[String]): Boolean =
    try { toColumn(ecql, topCols); true } catch { case _: Exception => false }
}
