package graft.etl

import scala.xml.{Elem, XML}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** IDoc-style XML explode (reference `pkg/idoc/explode.go:27-200`): one
  * document XML → header record + per-segment records routed into entity
  * groups (items / partners / statuses / dates), each emitted as a JSON
  * payload for its entity topic. UDTF shape: one input row → N typed output
  * rows, implemented as a flatMap over a Dataset (a Catalyst `Generator`
  * would also fit; flatMap keeps the row explosion inside one narrow stage,
  * which is all a 1→N transform needs at any scale).
  */
object IdocExplode {

  /** segment tag → entity route; unrouted tags are dropped (explode.go
    * routes by segment-group prefix). */
  final case class Config(routes: Map[String, String] = Map(
    "ITEM" -> "items", "PARTNER" -> "partners",
    "STATUS" -> "statuses", "DATE" -> "dates"))

  final case class ExplodedRecord(
      entity: String, docnum: String, seq: Int, payload: String)

  /** Parse one document; emits a `header` record plus routed segments. */
  def explodeXml(xml: String, cfg: Config = Config()): Seq[ExplodedRecord] = {
    val root: Elem = XML.loadString(xml)
    val docnum = (root \ "DOCNUM").text
    val headerFields = root.child.collect {
      case e: Elem if e.child.forall(!_.isInstanceOf[Elem]) =>
        e.label -> e.text
    }
    val header = ExplodedRecord("header", docnum, 0, toJson(headerFields))
    val segments = root.child.collect { case e: Elem => e }
      .filter(e => cfg.routes.contains(e.label))
      .zipWithIndex.map { case (seg, i) =>
        val fields = seg.child.collect { case f: Elem => f.label -> f.text }
        ExplodedRecord(cfg.routes(seg.label), docnum, i + 1,
          toJson(Seq("DOCNUM" -> docnum) ++ fields))
      }
    header +: segments
  }

  private def toJson(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) =>
      "\"" + escape(k) + "\":\"" + escape(v) + "\""
    }.mkString("{", ",", "}")

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** DataFrame flatMap: xmlCol → (entity, docnum, seq, payload) rows.
    * Multi-sink fan-out = `.filter(entity)` per target inside foreachBatch. */
  def explode(spark: SparkSession, df: DataFrame, xmlCol: String,
      cfg: Config = Config()): DataFrame = {
    import spark.implicits._
    df.select(xmlCol).as[String]
      .flatMap(x => explodeXml(x, cfg))
      .toDF()
  }

  /** Per-entity multi-sink fan-out (the reference emits one topic per
    * entity group): one parquet table per entity under `baseDir`. Shape
    * matches a `foreachBatch` body — call it per micro-batch for streaming.
    * Single-pass: partitionBy writes every entity in one job. */
  def fanOut(exploded: DataFrame, baseDir: String): Unit =
    exploded.write
      .mode("append")
      .partitionBy("entity")
      .parquet(baseDir)
}
