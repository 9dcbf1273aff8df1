package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Compat-mode MIN/MAX reproducing the reference's first-kind-wins semantics
  * over untyped display values (`server.go:2003-2011,2132-2182`): the first
  * value seen fixes the comparison *kind* — number, timestamp, or string —
  * and later values of a different kind are ignored; numbers compare
  * numerically (numeric strings coerce), everything else lexicographically.
  *
  * Spark's typed min/max make this hazard impossible on declared columns
  * (SURVEY §2.4 A5) — this Aggregator exists solely behind the `compat`
  * flag for byte-parity against the reference on untyped data. Distributed
  * correctly: merge() applies the same first-kind-wins rule to partial
  * buffers (the earlier-seen kind is whichever buffer is non-empty first;
  * within one kind merge is the plain min/max, so the result is
  * order-insensitive for same-kind data — exactly the reference's
  * reachable-state behavior).
  */
object CompatMinMax {

  val KindNone = 0
  val KindNumber = 1
  val KindTimestamp = 2
  val KindString = 3

  final case class Buf(kind: Int, num: Double, str: String)

  private val tsPattern =
    "\\d{4}-\\d{2}-\\d{2}[ T]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?Z?".r

  def kindOf(v: String): Int =
    if (v == null) KindNone
    else if (v.matches("-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?")) KindNumber
    else if (tsPattern.matches(v)) KindTimestamp
    else KindString

  /** Epoch ms of a timestamp-kind display value — the reference compares
    * timestamps NUMERICALLY on parsed epoch ms (updateAggMin/Max on
    * state.TS), not lexicographically; mixed-format values ('T' vs space,
    * varying fractional digits) must order by instant. */
  def tsMs(v: String): Double = {
    val normalized = v.replace(' ', 'T')
    try {
      if (normalized.endsWith("Z"))
        java.time.Instant.parse(normalized).toEpochMilli.toDouble
      else
        java.time.LocalDateTime.parse(normalized)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli.toDouble
    } catch { case _: java.time.format.DateTimeParseException => Double.NaN }
  }

  final class MinMaxAgg(isMin: Boolean) extends Aggregator[String, Buf, String] {
    override def zero: Buf = Buf(KindNone, 0.0, null)

    private def better(a: Double, b: Double): Boolean =
      if (isMin) b < a else b > a
    private def betterStr(a: String, b: String): Boolean =
      if (isMin) b < a else b > a

    // numbers AND timestamps carry a numeric sort key in `num`;
    // only the string kind compares lexicographically
    private def numericKind(k: Int): Boolean =
      k == KindNumber || k == KindTimestamp

    private def sortKey(k: Int, v: String): Double =
      if (k == KindNumber) v.toDouble else if (k == KindTimestamp) tsMs(v) else 0.0

    override def reduce(b: Buf, v: String): Buf = {
      val k = kindOf(v)
      if (k == KindNone) return b
      if (b.kind == KindNone) Buf(k, sortKey(k, v), v)
      else if (k != b.kind) b // first kind wins; mismatches ignored
      else if (numericKind(b.kind)) {
        val d = sortKey(k, v)
        if (better(b.num, d)) Buf(b.kind, d, v) else b
      } else if (betterStr(b.str, v)) Buf(b.kind, b.num, v)
      else b
    }

    override def merge(a: Buf, b: Buf): Buf =
      if (a.kind == KindNone) b
      else if (b.kind == KindNone) a
      else if (a.kind != b.kind) a
      else if (numericKind(a.kind))
        if (better(a.num, b.num)) b else a
      else if (betterStr(a.str, b.str)) b
      else a

    override def finish(r: Buf): String = if (r.kind == KindNone) null else r.str
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  def compatMin: MinMaxAgg = new MinMaxAgg(true)
  def compatMax: MinMaxAgg = new MinMaxAgg(false)
}
