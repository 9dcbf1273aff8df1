package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.etl.IcebergSink

/** Property-based Iceberg metadata-chain checks: random flat schemas,
  * random append sequences with random legal evolutions — after every
  * history, the metadata invariants hold and the metadata-driven read
  * returns exactly the union of everything appended. Raw ScalaCheck
  * generators with fixed seeds (the scalatest bridge isn't on the offline
  * classpath). */
class IcebergPropertySpec extends AnyFunSuite {
  import TestSpark._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val genType: Gen[DataType] = Gen.oneOf(
    IntegerType, LongType, FloatType, DoubleType, StringType, BooleanType)

  private def genSchema: Gen[StructType] = for {
    n <- Gen.choose(1, 5)
    types <- Gen.listOfN(n, genType)
  } yield StructType(StructField("id", LongType) +:
    types.zipWithIndex.map { case (t, i) => StructField(s"c$i", t) })

  private def valueFor(dt: DataType, r: scala.util.Random): Any = dt match {
    case IntegerType => r.nextInt(1000)
    case LongType => r.nextInt(100000).toLong
    case FloatType => (r.nextInt(1000) / 4.0).toFloat // exact in binary
    case DoubleType => r.nextInt(100000) / 8.0
    case StringType => s"s${r.nextInt(1000)}"
    case BooleanType => r.nextBoolean()
    case other => throw new IllegalArgumentException(other.toString)
  }

  /** A legal evolution of `schema`: maybe promote an int→long or
    * float→double column, maybe add a new column. */
  private def evolve(schema: StructType, r: scala.util.Random): StructType = {
    var fields = schema.fields.toSeq
    if (r.nextBoolean()) {
      fields = fields.map { f =>
        if (f.dataType == IntegerType && r.nextBoolean()) f.copy(dataType = LongType)
        else if (f.dataType == FloatType && r.nextBoolean()) f.copy(dataType = DoubleType)
        else f
      }
    }
    if (r.nextBoolean())
      fields = fields :+ StructField(s"x${fields.length}${r.nextInt(100)}",
        sample(genType, r.nextLong()))
    StructType(fields)
  }

  test("random overwrite histories: touched partitions replace exactly, others persist") {
    // interleaved appends and dynamic-partition overwrites against a
    // per-partition model: after EVERY operation the table equals the
    // model — an overwrite wipes exactly the partitions its batch
    // touches (even ones written across several prior manifests) and
    // never bleeds into the rest
    import spark.implicits._
    val parts = (0 until 5).map(i => s"p$i")
    for (trial <- 1 to 5) {
      val r = new scala.util.Random(4200L + trial)
      val table = Files.createTempDirectory("iceberg_ovw_prop").toString + "/t"
      var nextId = 0L
      def rows(k: Int, inParts: Seq[String]): Seq[(Long, String, Long)] =
        (0 until k).map { _ =>
          val id = nextId; nextId += 1
          (id, inParts(r.nextInt(inParts.size)), r.nextInt(1000).toLong)
        }
      var model = Map.empty[String, Map[Long, Long]].withDefaultValue(Map.empty)
      def doAppend(rs: Seq[(Long, String, Long)]): Unit = {
        IcebergSink.append(spark, table, rs.toDF("id", "part", "v"),
          partitionBy = Seq("part"))
        rs.foreach { case (id, p, v) => model += p -> (model(p) + (id -> v)) }
      }
      def doOverwrite(rs: Seq[(Long, String, Long)]): Unit = {
        IcebergSink.overwritePartitions(spark, table,
          rs.toDF("id", "part", "v"))
        rs.map(_._2).distinct.foreach(p => model += p -> Map.empty[Long, Long])
        rs.foreach { case (id, p, v) => model += p -> (model(p) + (id -> v)) }
      }
      // a ROW DELTA on the partitioned table: replaces each key wherever
      // it lives (global equality delete), re-inserts under its new tuple
      def doUpsert(rs0: Seq[(Long, String, Long)]): Unit = {
        val existing = model.values.flatMap(_.keys).toSeq
        val rs = rs0.zipWithIndex.map { case ((id, p, v), i) =>
          // replace an existing id half the time, else insert fresh
          if (existing.nonEmpty && r.nextBoolean())
            (existing(r.nextInt(existing.size)), p, v)
          else (id, p, v)
        }.distinctBy(_._1)
        IcebergSink.upsertAtomic(spark, table, rs.toDF("id", "part", "v"),
          Seq("id"))
        rs.foreach { case (id, p, v) =>
          model = model.map { case (mp, m0) => mp -> (m0 - id) }
            .withDefaultValue(Map.empty)
          model += p -> (model(p) + (id -> v))
        }
      }
      doAppend(rows(r.nextInt(20) + 5, parts))
      for (step <- 1 to 4) {
        r.nextInt(3) match {
          case 0 => doAppend(rows(r.nextInt(10) + 1, parts))
          case 1 =>
            val sub = parts.filter(_ => r.nextBoolean()) match {
              case Seq() => Seq(parts(r.nextInt(parts.size)))
              case s => s
            }
            doOverwrite(rows(r.nextInt(8) + 1, sub))
          case 2 => doUpsert(rows(r.nextInt(6) + 1, parts))
        }
        // maintenance must be invisible to every read below: metadata-only
        // manifest merging and dangling-delete dropping at coin-flip odds,
        // plus an occasional full compact (materializes pending deletes,
        // which makes later delete files dangle — the two interact)
        if (r.nextBoolean()) IcebergSink.rewriteManifests(spark, table)
        if (r.nextBoolean()) IcebergSink.removeDanglingDeletes(spark, table)
        if (r.nextInt(4) == 0) IcebergSink.compact(spark, table, targetFiles = 2)
        val got = IcebergSink.read(spark, table).collect()
          .map(row => (row.getAs[Long]("id"), row.getAs[String]("part"),
            row.getAs[Long]("v"))).toSet
        val want = model.toSeq.flatMap { case (p, m) =>
          m.map { case (id, v) => (id, p, v) }
        }.toSet
        assert(got == want,
          s"trial $trial step $step:\n missing=${want.diff(got)}\n extra=${got.diff(want)}")
      }
    }
  }

  test("random append histories: invariants hold, read-back is the exact union") {
    (0 until 8).foreach { trial =>
      val r = new scala.util.Random(1000 + trial)
      val table = Files.createTempDirectory(s"ice_prop$trial").toString + "/t"
      var schema = sample(genSchema, 500 + trial)
      var nextId = 0L
      // expected state: id -> (column name -> value), plus each id's schema
      val expected = scala.collection.mutable.Map[Long, Map[String, Any]]()
      val nAppends = 2 + r.nextInt(3)
      (0 until nAppends).foreach { a =>
        if (a > 0) schema = evolve(schema, r)
        val rows = (0 until 1 + r.nextInt(4)).map { _ =>
          val id = nextId; nextId += 1
          val vals = schema.fields.map {
            case StructField("id", _, _, _) => "id" -> id
            case f => f.name -> valueFor(f.dataType, r)
          }.toMap
          expected(id) = vals
          Row.fromSeq(schema.fields.map(f => vals(f.name)).toIndexedSeq)
        }
        val df = spark.createDataFrame(
          new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
        IcebergSink.append(spark, table, df)
      }

      val m = IcebergSink.load(spark, table).get
      // invariants: version count, linear lineage, monotone sequence
      // numbers, field ids stable and last-column-id is the max id
      assert(m.version == nAppends)
      assert(m.snapshots.length == nAppends)
      m.snapshots.sliding(2).foreach {
        case Seq(a, b) => assert(b.parentId.contains(a.snapshotId))
        case _ =>
      }
      assert(m.snapshots.map(_.sequenceNumber) == (1 to nAppends).map(_.toLong))
      assert(m.fields.map(_.id) == (1 to m.fields.length))
      assert(m.lastColumnId == m.fields.length)
      // every column ever written is in the current schema
      val colNames = m.fields.map(_.name).toSet
      assert(expected.values.flatMap(_.keys).toSet.subsetOf(colNames))

      // read-back: every appended row comes back, later columns null for
      // earlier rows, numerics widened per the current schema
      val out = IcebergSink.read(spark, table).collect()
      assert(out.length == expected.size, s"trial $trial row count")
      val curSchema = m.currentSchema
      out.foreach { row =>
        val id = row.getAs[Long]("id")
        val want = expected(id)
        curSchema.fields.zipWithIndex.foreach { case (f, i) =>
          want.get(f.name) match {
            case None => assert(row.isNullAt(i),
              s"trial $trial id=$id ${f.name} should be null")
            case Some(v) =>
              val got = row.get(i)
              val wantNorm = (v, f.dataType) match {
                case (x: Int, LongType) => x.toLong
                case (x: Float, DoubleType) => x.toDouble
                case _ => v
              }
              assert(got == wantNorm,
                s"trial $trial id=$id ${f.name}: got $got want $wantNorm")
          }
        }
      }
    }
  }
}
