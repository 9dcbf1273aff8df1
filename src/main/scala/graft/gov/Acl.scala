package graft.gov

import java.util.concurrent.ConcurrentHashMap

import graft.kafsql.{DescribeConfigs, DescribeGroup, DescribeTopic, Explain,
  Kafsql, Select, ShowGroups, ShowOffsets, ShowOffsetsAt, ShowPartitions,
  ShowSegments, ShowTopics, Statement}

/** Topic-level authorization — clean-room mirror of the reference proxy's
  * allow/deny glob ACL (`proxy/acl.go:28-68`):
  *
  *   - deny patterns win over allow patterns
  *   - an empty allow list means "everything not denied"
  *   - `SHOW TOPICS` (which would enumerate past the ACL) is allowed only
  *     when there is NO deny list and the allow list is empty or matches
  *     the literal `*` (`acl.go:38-46`)
  *   - patterns are Go `path.Match` globs: `*`, `?`, `[a-z]`/`[^a-z]`
  *     classes, `\`-escapes; a pattern also matches itself literally
  *
  * Topics never contain `/`, so the non-separator restriction of
  * `path.Match` is moot; the glob compiles to an anchored regex, cached
  * per pattern.
  */
final case class TopicAcl(allow: Seq[String] = Nil, deny: Seq[String] = Nil) {

  def isOpen: Boolean = allow.isEmpty && deny.isEmpty

  /** `acl.go:28-36`: deny wins; empty allow = allow-all. */
  def allows(topic: String): Boolean =
    if (TopicAcl.matchPatterns(deny, topic)) false
    else if (allow.isEmpty) true
    else TopicAcl.matchPatterns(allow, topic)

  /** `acl.go:38-46`. */
  def allowShowTopics: Boolean =
    if (deny.nonEmpty) false
    else if (allow.isEmpty) true
    else TopicAcl.matchPatterns(allow, "*")
}

object TopicAcl {

  private val patternCache = new ConcurrentHashMap[String, java.util.regex.Pattern]()

  /** `acl.go:48-68`: blank patterns skipped; `*` and the literal topic
    * always match; otherwise glob. */
  def matchPatterns(patterns: Seq[String], topic: String): Boolean =
    patterns.exists { p0 =>
      val p = p0.trim
      p.nonEmpty &&
        (p == "*" || p == topic || compiled(p).matcher(topic).matches())
    }

  private def compiled(glob: String): java.util.regex.Pattern =
    patternCache.computeIfAbsent(glob, g =>
      java.util.regex.Pattern.compile(globToRegex(g)))

  /** Go `path.Match` glob → anchored Java regex. Malformed classes compile
    * to a never-matching regex (path.Match returns ErrBadPattern → the
    * reference treats it as no match). */
  private[gov] def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append("[^/]*")
        case '?' => sb.append("[^/]")
        case '\\' if i + 1 < glob.length =>
          sb.append(java.util.regex.Pattern.quote(glob.charAt(i + 1).toString))
          i += 1
        case '[' =>
          val close = glob.indexOf(']', i + (if (i + 1 < glob.length &&
            (glob.charAt(i + 1) == '^' || glob.charAt(i + 1) == ']')) 2 else 1))
          if (close < 0) return "(?!)" // unterminated class: never matches
          val body = glob.substring(i + 1, close)
          val neg = body.startsWith("^")
          val chars = if (neg) body.substring(1) else body
          // keep ranges; escape regex metachars other than '-'
          val safe = chars.flatMap {
            case c if c == '-' => "-"
            case c if "\\^]&[".contains(c) => "\\" + c
            case c => c.toString
          }
          sb.append(if (neg) s"[^$safe]" else s"[$safe]")
          i = close
        case c => sb.append(java.util.regex.Pattern.quote(c.toString))
      }
      i += 1
    }
    sb.append("$").toString
  }
}

/** Thrown on an ACL denial; pg-wire maps it to SQLSTATE 42501
  * (insufficient_privilege). */
final class AclDeniedException(msg: String) extends RuntimeException(msg)

/** Query-level authorization with a TTL + max-entry decision cache, keyed
  * by the trimmed query text — the reference proxy's `authorizeQuery` +
  * `queryCache` (`proxy.go:268-296`, `cache.go:22-80`): parsing every
  * repeated dashboard query just to re-derive its topic set is measurable
  * overhead at proxy rates, and decisions are pure functions of (ACL,
  * query), so a short TTL is safe.
  *
  * Semantics mirrored exactly: empty statements and SET/RESET pass without
  * parsing; an open ACL passes everything; a query the dialect cannot parse
  * is DENIED (fail closed — "proxy cannot authorize query"); SHOW TOPICS
  * requires [[TopicAcl.allowShowTopics]]; every referenced topic (FROM +
  * JOIN, DESCRIBE/SHOW PARTITIONS target, EXPLAIN's inner SELECT) must pass
  * [[TopicAcl.allows]].
  */
final class AclAuthorizer(val acl: TopicAcl, ttlMs: Long = 30000,
    maxEntries: Int = 1024) {

  final case class Decision(allowed: Boolean, reason: String,
      topics: Seq[String], showTopics: Boolean)

  private final case class Entry(createdMs: Long, d: Decision)
  // insertion-order eviction, like the reference's order slice (cache.go:64-80)
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Entry](64, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Entry]): Boolean = size() > maxEntries
    })

  def authorize(query: String): Decision = {
    val trimmed = query.trim.stripSuffix(";").trim
    if (trimmed.isEmpty) return Allow
    val lower = trimmed.toLowerCase
    if (lower.startsWith("set ") || lower.startsWith("reset ")) return Allow
    if (acl.isOpen) return Allow
    val now = System.currentTimeMillis()
    val hit = cache.get(trimmed)
    if (hit != null && now - hit.createdMs <= ttlMs) return hit.d
    val d = decide(trimmed)
    cache.put(trimmed, Entry(now, d))
    d
  }

  /** Throwing form for call sites that gate execution. */
  def check(query: String): Unit = {
    val d = authorize(query)
    if (!d.allowed) throw new AclDeniedException(d.reason)
  }

  private val Allow = Decision(allowed = true, "", Nil, showTopics = false)

  private def decide(trimmed: String): Decision = {
    val stmt =
      try Kafsql.parse(trimmed)
      catch { case _: Exception =>
        return Decision(allowed = false, "proxy cannot authorize query",
          Nil, showTopics = false)
      }
    val (topics, showTopics) = AclAuthorizer.queryTopics(stmt)
    if (showTopics && !acl.allowShowTopics)
      return Decision(allowed = false,
        "show topics is not allowed by proxy ACL", topics, showTopics)
    topics.find(!acl.allows(_)) match {
      case Some(t) => Decision(allowed = false,
        s"""access denied to topic "$t"""", topics, showTopics)
      case None => Decision(allowed = true, "", topics, showTopics)
    }
  }

  def cacheSize: Int = cache.size()
}

object AclAuthorizer {
  /** No-op authorizer (open ACL). */
  val open = new AclAuthorizer(TopicAcl())

  /** Topics a statement touches (`proxy.go:297-320`). EXHAUSTIVE over the
    * statement algebra — a new statement falling through here would be a
    * MatchError under a restrictive ACL, which denies (the error aborts
    * the query) but with a crash instead of the proxy's clean denial. */
  def queryTopics(stmt: Statement): (Seq[String], Boolean) = stmt match {
    case ShowTopics => (Nil, true)
    case ShowPartitions(t) => (Seq(t), false)
    case ShowSegments(t) => (Seq(t), false)
    case ShowOffsets(t) => (Seq(t), false)
    case ShowOffsetsAt(t, _) => (Seq(t), false)
    case DescribeTopic(t) => (Seq(t), false)
    case DescribeConfigs(t) => (Seq(t), false)
    // group introspection reads coordinator metadata, not topic data —
    // the reference gates ListGroups/DescribeGroups on the group APIs,
    // not per-topic fetch ACLs
    case ShowGroups => (Nil, false)
    case DescribeGroup(_) => (Nil, false)
    case e: Explain => queryTopics(e.select)
    case s: Select =>
      (s.from.topic +: s.join.map(_.table.topic).toSeq, false)
  }
}
