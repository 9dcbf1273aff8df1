package graft.kafsql

import java.time.format.DateTimeFormatter
import java.time.{LocalDateTime, OffsetDateTime, ZoneOffset}
import scala.collection.mutable.ArrayBuffer

/** Hand-rolled KAFSQL tokenizer + recursive-descent parser. Grammar parity
  * with the reference (`sql/parser.go`): statements dispatch on
  * show|describe|select|explain (`parser.go:39-50`); WHERE supports only the
  * partition-equality / offset-range / timestamp-range forms; ORDER BY
  * accepts `_ts` only; LAST takes Go-style durations plus `Nd` days.
  */
object Parser {

  // ---- lexer ------------------------------------------------------------

  sealed trait Tok
  final case class Ident(s: String) extends Tok { def lower: String = s.toLowerCase }
  final case class Num(s: String) extends Tok
  final case class Str(s: String) extends Tok
  final case class Sym(s: String) extends Tok
  case object EOF extends Tok

  def lex(sql: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        while (i < n && sql.charAt(i) != '\'') { sb += sql.charAt(i); i += 1 }
        if (i >= n) throw new KafsqlException("unterminated string literal")
        i += 1
        out += Str(sb.toString)
      } else if (c.isDigit || (c == '-' && i + 1 < n && sql.charAt(i + 1).isDigit)) {
        val sb = new StringBuilder
        sb += c; i += 1
        // numbers may be durations (5m, 7d, 1h30m) or ts digits or plain ints
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '.')) {
          sb += sql.charAt(i); i += 1
        }
        out += Num(sb.toString)
      } else if (c.isLetter || c == '_') {
        val sb = new StringBuilder
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) {
          sb += sql.charAt(i); i += 1
        }
        out += Ident(sb.toString)
      } else if (c == '>' || c == '<') {
        if (i + 1 < n && sql.charAt(i + 1) == '=') { out += Sym(s"$c="); i += 2 }
        else { out += Sym(c.toString); i += 1 }
      } else if ("(),.*=".indexOf(c) >= 0) {
        out += Sym(c.toString); i += 1
      } else if (c == ';') i += 1
      else throw new KafsqlException(s"unexpected character '$c' at $i")
    }
    out += EOF
    out.toVector
  }

  // ---- durations + timestamp literals ------------------------------------

  /** Go-style duration (`300ms`, `5s`, `10m`, `2h`, compound `1h30m`) plus
    * `Nd` days (server.go:2864-2878). */
  def parseDurationMs(s: String): Long = {
    val re = "(\\d+(?:\\.\\d+)?)(ns|us|ms|s|m|h|d)".r
    val matches = re.findAllMatchIn(s).toSeq
    if (matches.isEmpty || matches.map(_.matched).mkString != s)
      throw new KafsqlException(s"invalid duration: $s")
    matches.map { m =>
      val v = m.group(1).toDouble
      val unit = m.group(2) match {
        case "ns" => 1e-6
        case "us" => 1e-3
        case "ms" => 1.0
        case "s" => 1000.0
        case "m" => 60000.0
        case "h" => 3600000.0
        case "d" => 86400000.0
      }
      (v * unit).toLong
    }.sum
  }

  private val tsLayouts = Seq(
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd"))

  /** Literal = epoch-ms integer, `yyyy-MM-dd[ HH:mm:ss[.SSS]]`, or RFC3339
    * (parser.go:405-424). */
  def parseTsLiteralMs(s: String): Long = {
    if (s.matches("-?\\d+")) return s.toLong
    try return OffsetDateTime.parse(s).toInstant.toEpochMilli
    catch { case _: Exception => }
    for (f <- tsLayouts) {
      try {
        val ldt =
          if (f == tsLayouts(2)) java.time.LocalDate.parse(s, f).atStartOfDay()
          else LocalDateTime.parse(s, f)
        return ldt.toInstant(ZoneOffset.UTC).toEpochMilli
      } catch { case _: Exception => }
    }
    throw new KafsqlException(s"invalid timestamp literal: $s")
  }

  // ---- parser -----------------------------------------------------------

  def parse(sql: String): Statement = new P(lex(sql)).statement()

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def kw(s: String): Boolean = peek match {
      case i: Ident if i.lower == s => pos += 1; true
      case _ => false
    }
    private def expectKw(s: String): Unit =
      if (!kw(s)) throw new KafsqlException(s"expected $s, got $peek")
    private def expectSym(s: String): Unit = next() match {
      case Sym(`s`) =>
      case t => throw new KafsqlException(s"expected '$s', got $t")
    }
    private def ident(): String = next() match {
      case i: Ident => i.s
      case t => throw new KafsqlException(s"expected identifier, got $t")
    }
    private def int(): Long = next() match {
      case Num(s) if s.matches("-?\\d+") => s.toLong
      case t => throw new KafsqlException(s"expected integer, got $t")
    }

    def statement(): Statement = {
      val st =
        if (kw("show")) {
          if (kw("topics")) ShowTopics
          else if (kw("partitions")) { expectKw("from"); ShowPartitions(ident()) }
          else if (kw("segments")) { expectKw("from"); ShowSegments(ident()) }
          else if (kw("offsets")) {
            expectKw("from")
            val t = ident()
            if (kw("at")) ShowOffsetsAt(t, tsLit()) else ShowOffsets(t)
          }
          else if (kw("groups")) ShowGroups
          else throw new KafsqlException(
            "expected TOPICS, PARTITIONS, SEGMENTS, OFFSETS, or GROUPS after SHOW")
        } else if (kw("describe")) {
          if (kw("configs")) DescribeConfigs(ident())
          else if (kw("group")) DescribeGroup(ident())
          else DescribeTopic(ident())
        }
        else if (kw("explain")) {
          val analyze = kw("analyze")
          Explain(select(), analyze)
        }
        else if (peek.isInstanceOf[Ident] &&
          peek.asInstanceOf[Ident].lower == "select") select()
        else throw new KafsqlException(s"expected show|describe|select|explain, got $peek")
      peek match {
        case EOF => st
        case t => throw new KafsqlException(s"trailing input: $t")
      }
    }

    def select(): Select = {
      expectKw("select")
      var star = false
      val projections = ArrayBuffer.empty[Projection]
      if (peek == Sym("*")) { next(); star = true }
      else {
        projections += projection()
        while (peek == Sym(",")) { next(); projections += projection() }
      }
      expectKw("from")
      val from = tableRef()
      var join: Option[JoinClause] = None
      if (peek.isInstanceOf[Ident]) {
        val l = peek.asInstanceOf[Ident].lower
        if (l == "join" || l == "left") {
          val isLeft = l == "left"
          next()
          if (isLeft) expectKw("join")
          val t = tableRef()
          val on =
            if (kw("on")) {
              val lhs = joinSide()
              expectSym("=")
              val rhs = joinSide()
              Some((lhs, rhs))
            } else None
          expectKw("within")
          val d = next() match {
            case Num(s) => Parser.parseDurationMs(s)
            case t2 => throw new KafsqlException(s"expected duration after WITHIN, got $t2")
          }
          join = Some(JoinClause(isLeft, t, on, d))
        }
      }
      val where = ArrayBuffer.empty[Predicate]
      if (kw("where")) {
        where += predicate()
        while (kw("and")) where += predicate()
      }
      var groupBy = Seq.empty[ColRef]
      if (kw("group")) {
        expectKw("by")
        val g = ArrayBuffer.empty[ColRef]
        g += colRef()
        while (peek == Sym(",")) { next(); g += colRef() }
        groupBy = g.toSeq
      }
      var orderBy: Option[OrderBy] = None
      if (kw("order")) {
        expectKw("by")
        val c = ident()
        val asc = if (kw("desc")) false else { kw("asc"); true }
        orderBy = Some(OrderBy(c, asc))
      }
      var limit: Option[Int] = None
      if (kw("limit")) limit = Some(int().toInt)
      var window: Option[WindowClause] = None
      if (kw("last")) {
        val d = next() match {
          case Num(s) => Parser.parseDurationMs(s)
          case t => throw new KafsqlException(s"expected duration after LAST, got $t")
        }
        window = Some(Last(d))
      } else if (kw("tail")) window = Some(Tail(int().toInt))
      else if (kw("scan")) { expectKw("full"); window = Some(ScanFull) }
      Select(star, projections.toSeq, from, join, where.toSeq, groupBy,
        orderBy, limit, window)
    }

    private def tableRef(): TableRef = {
      val t = ident()
      val alias = peek match {
        case i: Ident if !reserved(i.lower) => next(); Some(i.s)
        case _ => None
      }
      TableRef(t, alias)
    }

    private val reservedWords = Set("join", "left", "on", "within", "where",
      "group", "order", "limit", "last", "tail", "scan", "and", "by", "from",
      "select", "as", "desc", "asc", "between")
    private def reserved(s: String): Boolean = reservedWords(s)

    private def projection(): Projection = {
      val e = expr()
      val alias =
        if (kw("as")) Some(ident())
        else peek match {
          case i: Ident if !reserved(i.lower) => next(); Some(i.s)
          case _ => None
        }
      Projection(e, alias)
    }

    private def expr(): Expr = peek match {
      case i: Ident =>
        i.lower match {
          case k @ ("count" | "sum" | "avg" | "min" | "max")
              if toks(pos + 1) == Sym("(") =>
            next(); next()
            val arg =
              if (peek == Sym("*")) { next(); None }
              else Some(nonAggExpr())
            if (k != "count" && arg.isEmpty)
              throw new KafsqlException(s"$k(*) is not valid")
            expectSym(")")
            AggFunc(k, arg)
          case _ => nonAggExpr()
        }
      case t => throw new KafsqlException(s"expected expression, got $t")
    }

    private def nonAggExpr(): Expr = peek match {
      case i: Ident
          if Set("json_value", "json_query", "json_exists")(i.lower) &&
            toks(pos + 1) == Sym("(") =>
        val kind = i.lower.stripPrefix("json_")
        next(); next()
        val target = colRef()
        expectSym(",")
        val path = next() match {
          case Str(s) => s
          case t => throw new KafsqlException(s"expected path string, got $t")
        }
        expectSym(")")
        if (!path.startsWith("$."))
          throw new KafsqlException(s"json path must start with $$.: $path")
        JsonFunc(kind, target, path)
      case _: Ident => colRef()
      case t => throw new KafsqlException(s"expected expression, got $t")
    }

    private def colRef(): ColRef = {
      val first = ident()
      if (peek == Sym(".")) { next(); ColRef(Some(first), ident()) }
      else ColRef(None, first)
    }

    /** Join condition side: `_key`, `alias._key`, or json_value(...) */
    private def joinSide(): Expr = nonAggExpr()

    private def predicate(): Predicate = {
      val c = colRef()
      c.name match {
        case "_partition" =>
          expectSym("=")
          PartitionEq(int().toInt)
        case "_offset" =>
          next() match {
            case Sym(">=") => OffsetCmp(gte = true, int())
            case Sym("<=") => OffsetCmp(gte = false, int())
            case t => throw new KafsqlException(
              s"_offset supports only >= and <=, got $t") // parser.go:241-258
          }
        case "_ts" =>
          peek match {
            case i: Ident if i.lower == "between" =>
              next()
              val lo = tsLit()
              expectKw("and")
              val hi = tsLit()
              TsBetween(lo, hi)
            case Sym(">=") => next(); TsCmp(gte = true, tsLit())
            case Sym("<=") => next(); TsCmp(gte = false, tsLit())
            case t => throw new KafsqlException(s"_ts supports >=, <=, BETWEEN, got $t")
          }
        case other => throw new KafsqlException(
          s"unsupported WHERE column: $other (only _partition/_offset/_ts)")
      }
    }

    private def tsLit(): Long = next() match {
      case Str(s) => Parser.parseTsLiteralMs(s)
      case Num(s) if s.matches("-?\\d+") => s.toLong
      case t => throw new KafsqlException(s"expected timestamp literal, got $t")
    }
  }
}
