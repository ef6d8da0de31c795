package graft

import graft.sources.SnapshotTable
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized scenario battery over the snapshot layer (VERDICT r9
  * item 3). Three rounds in a row found a snapshot bug rooted in a
  * FIXTURE assumption (r8: CDC column order; r9: lossy key cast,
  * unionByName type widening), so this suite stops hand-writing
  * fixtures: a seeded generator drives random column orders, key
  * types, additive evolutions, lossless narrowing casts, and
  * merge / restore / compact sequences against a pure in-memory
  * MODEL of the documented semantics, then checks every committed
  * version by time travel. 60 scenarios × 4-7 ops each; the seed is
  * fixed so a failure reproduces exactly.
  *
  * Model semantics checked (the merge contract after ADVICE r9):
  *   - mergeByKey upserts one row per key; matched keys REPLACE
  *     columns the source provides, PRESERVE table columns absent
  *     from the source (Delta updateAll parity); inserted keys
  *     null-fill absent columns (insertAll);
  *   - a column's PHYSICAL type is set by the source that first
  *     carries it; later sources cast to it (store assignment),
  *     and the cast must be lossless-in-fact;
  *   - a source-side new column appends to the layout, old rows
  *     null; column order never drifts across permuted sources;
  *   - restore(v) makes the table content- and schema-identical to
  *     v as a NEW version; compactFiles preserves content exactly;
  *   - read(root, v) reproduces version v forever (time travel).
  */
class SnapshotFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-fuzz-").toString

  private type Rnd = scala.util.Random

  /** Declared "logical" type of a column — the family its values are
    * drawn from; the physical table type is whatever source type
    * first carries it (tracked dynamically below).
    */
  private val logicalTypes: Seq[DataType] =
    Seq(LongType, IntegerType, DoubleType, StringType)

  // raw value "seed": small integers for the Int/Long families
  // (exactly representable in every numeric type, so any narrowing
  // the generator produces is lossless-in-fact), quarter-doubles for
  // the Double family (whose physical type is pinned to Double by
  // stForCol below, so fractions never meet a narrowing cast)
  private def genSeed(logical: DataType, r: Rnd): Any = logical match {
    case StringType => s"s${r.nextInt(30)}"
    case DoubleType => r.nextInt(50) / 4.0
    case _ => r.nextInt(50)
  }

  private def hasFrac(seeds: Seq[Any]): Boolean = seeds.exists {
    case d: Double => d != math.floor(d)
    case _ => false
  }

  private def coerce(v: Any, to: DataType): Any = (v, to) match {
    case (null, _) => null
    case (x: Int, LongType) => x.toLong
    case (x: Int, DoubleType) => x.toDouble
    case (x: Long, IntegerType) => x.toInt
    case (x: Long, DoubleType) => x.toDouble
    case (x: Double, LongType) => x.toLong
    case (x: Double, IntegerType) => x.toInt
    case (x, _) => x
  }

  private def buildDf(cols: Seq[(String, DataType)], rows: Seq[Seq[Any]]): DataFrame = {
    val schema = StructType(cols.map { case (n, t) => StructField(n, t, nullable = true) })
    val jrows = new java.util.ArrayList[Row]()
    rows.foreach(r => jrows.add(Row.fromSeq(r)))
    spark.createDataFrame(jrows, schema)
  }

  test("60 randomized merge/restore/compact scenarios match the model") {
    val seed = 20260814L
    for (scenario <- 0 until 60) {
      val rnd = new scala.util.Random(seed + scenario)
      val root = tmp()

      // ---- scenario shape -----------------------------------------
      val colPool: Seq[(String, DataType)] = {
        val keyT = logicalTypes(rnd.nextInt(logicalTypes.length))
        val nVals = 1 + rnd.nextInt(3)
        ("k" -> keyT) +: (0 until nVals).map(i =>
          s"v$i" -> logicalTypes(rnd.nextInt(logicalTypes.length)))
      }
      val evoCol = "e" -> logicalTypes(rnd.nextInt(logicalTypes.length))
      val logicalOf = (colPool :+ evoCol).toMap
      // small stable key universe so merges actually collide
      val keyUniverse = Seq.fill(8)(genSeed(logicalOf("k"), rnd)).distinct

      // ---- model state --------------------------------------------
      var layout: Seq[(String, DataType)] = Seq.empty // physical layout
      var rows: Map[Any, Map[String, Any]] = Map.empty // key SEED -> row
      var history: Map[Int, (Seq[(String, DataType)], Map[Any, Map[String, Any]])] =
        Map.empty

      // the source type this column arrives in. A column already in
      // the layout must arrive castable-to-physical with lossless
      // values; a NEW column's arrival type BECOMES its physical
      // type (Double family pinned to Double so fractional seeds
      // never meet a narrowing cast later).
      def stForCol(n: String, lt: DataType, frac: Boolean): DataType =
        layout.find(_._1 == n).map(_._2) match {
          case Some(StringType) => StringType
          case Some(DoubleType) =>
            if (frac) DoubleType
            else Seq(IntegerType, DoubleType)(rnd.nextInt(2))
          case Some(_) => // integral physical; seeds are small ints
            Seq(IntegerType, LongType, DoubleType)(rnd.nextInt(3))
          case None => lt match {
            case StringType => StringType
            case DoubleType => DoubleType
            case _ => Seq(IntegerType, LongType, DoubleType)(rnd.nextInt(3))
          }
        }

      def mergeOp(withEvo: Boolean): Unit = {
        val valCols = colPool.tail.filter(_ => rnd.nextBoolean())
        val present = (colPool.head +: valCols) ++
          (if (withEvo) Seq(evoCol) else Seq.empty)
        val ks = rnd.shuffle(keyUniverse).take(1 + rnd.nextInt(4))
        // per-column source type and per-row values (as seeds)
        val withSeeds = present.map { case (n, lt) =>
          val seeds = ks.map(k => if (n == "k") k else genSeed(lt, rnd))
          (n, stForCol(n, lt, hasFrac(seeds)), seeds)
        }
        val order = rnd.shuffle(withSeeds)
        val df = buildDf(
          order.map { case (n, st, _) => (n, st) },
          ks.indices.map(i => order.map { case (_, st, seeds) => coerce(seeds(i), st) }))
        SnapshotTable.mergeByKey(spark, root, df, Seq("k"))

        // ---- model update -----------------------------------------
        // physical type: set at first arrival, sticky afterwards
        val newCols = order.collect {
          case (n, st, _) if !layout.exists(_._1 == n) => (n, st)
        }
        layout = layout ++ newCols
        val phys = layout.toMap
        for ((k, i) <- ks.zipWithIndex) {
          val provided = order.map { case (n, _, seeds) => n -> seeds(i) }.toMap
          val base = rows.getOrElse(k,
            layout.map { case (n, _) => n -> null }.toMap)
          val merged = layout.map { case (n, dt) =>
            n -> (provided.get(n) match {
              case Some(v) => coerce(v, dt)
              case None => base.getOrElse(n, null)
            })
          }.toMap
          rows = rows.updated(k, merged)
        }
        rows = rows.map { case (k, r) => // null-backfill appended cols
          k -> layout.map { case (n, _) => n -> r.getOrElse(n, null) }.toMap
        }
        history += SnapshotTable.currentVersion(root) -> (layout, rows)
      }

      def restoreOp(): Unit = {
        val cur = SnapshotTable.currentVersion(root)
        if (cur >= 2) {
          val target = 1 + rnd.nextInt(cur)
          SnapshotTable.restore(spark, root, target)
          val (l, m) = history(target)
          layout = l; rows = m
          history += SnapshotTable.currentVersion(root) -> (layout, rows)
        }
      }

      def compactOp(): Unit = {
        SnapshotTable.compactFiles(spark, root)
        history += SnapshotTable.currentVersion(root) -> (layout, rows)
      }

      // deletion-vector DELETE by key predicate: exercises the
      // merge-on-read path (hard-linked files + cumulative _dv)
      // inside random sequences — a later merge re-inserting a
      // deleted key must resurrect it, restore must bring deleted
      // rows back, compact must drop them physically
      def deleteOp(): Unit = {
        if (rows.nonEmpty) {
          val kPhys = layout.find(_._1 == "k").get._2
          val victims = rnd.shuffle(rows.keys.toSeq).take(1 + rnd.nextInt(2))
          def litOf(seed: Any): String = coerce(seed, kPhys) match {
            case s: String => s"'$s'"
            case x => x.toString
          }
          SnapshotTable.deleteWhere(spark, root,
            s"k IN (${victims.map(litOf).mkString(", ")})")
          rows = rows -- victims
          history += SnapshotTable.currentVersion(root) -> (layout, rows)
        }
      }

      // ---- run ----------------------------------------------------
      mergeOp(withEvo = false) // seed the table
      val nOps = 3 + rnd.nextInt(3)
      for (_ <- 0 until nOps) rnd.nextInt(10) match {
        case n if n <= 4 => mergeOp(withEvo = false)
        case 5 | 6 => mergeOp(withEvo = true)
        case 7 => deleteOp()
        case 8 => restoreOp()
        case _ => compactOp()
      }

      // ---- verify CDC between random version pairs ----------------
      // (the r8 CDC bug survived seven rounds of fixtures; fuzz it
      // too). Expected keyed feed from the model: inserts = keys only
      // in v2, deletes = keys only in v1 (restores produce real
      // deletes), update pre/post where the union-aligned rows
      // differ. A column re-added with a DIFFERENT physical type
      // after a restore boundary must refuse loudly instead.
      val versions = history.keys.toSeq.sorted
      val pairs = Seq.fill(3)((versions(rnd.nextInt(versions.length)),
        versions(rnd.nextInt(versions.length))))
        .collect { case (a, b) if a < b => (a, b) }.distinct
      for ((v1, v2) <- pairs) {
        val (l1, m1) = history(v1)
        val (l2, m2) = history(v2)
        val conflict = l1.exists { case (n, dt) =>
          l2.exists(c => c._1 == n && c._2 != dt) }
        if (conflict) {
          val e = intercept[IllegalArgumentException] {
            SnapshotTable.changesByKey(spark, root, v1, v2, Seq("k")).collect()
          }
          assert(e.getMessage.contains("changed type"),
            s"scenario $scenario cdc $v1->$v2 conflict not loud")
        } else {
          val ul = l1 ++ l2.filterNot(c => l1.exists(_._1 == c._1))
          def pad(r: Map[String, Any]): Map[String, Any] =
            ul.map { case (n, _) => n -> r.getOrElse(n, null) }.toMap
          val k1 = m1.keySet; val k2 = m2.keySet
          val expected: Set[(Map[String, Any], String)] =
            (k2 -- k1).map(k => (pad(m2(k)), "insert")) ++
              (k1 -- k2).map(k => (pad(m1(k)), "delete")) ++
              (k1 & k2).filter(k => pad(m1(k)) != pad(m2(k)))
                .flatMap(k => Seq((pad(m1(k)), "update_preimage"),
                  (pad(m2(k)), "update_postimage")))
          val got = SnapshotTable.changesByKey(spark, root, v1, v2, Seq("k"))
            .collect().map { r =>
              (ul.map { case (n, _) =>
                n -> (if (r.isNullAt(r.fieldIndex(n))) null
                      else r.get(r.fieldIndex(n)))
              }.toMap,
                r.getString(r.fieldIndex("_change_type")))
            }.toSet
          assert(got === expected,
            s"scenario $scenario (seed ${seed + scenario}) cdc $v1->$v2 mismatch:\n" +
              s"  got      ${got.toSeq.map(_.toString).sorted.mkString("; ")}\n" +
              s"  expected ${expected.toSeq.map(_.toString).sorted.mkString("; ")}")
        }
      }

      // ---- verify EVERY version by time travel --------------------
      for ((v, (l, m)) <- history) {
        val df = SnapshotTable.read(spark, root, v)
        assert(df.schema.map(f => (f.name, f.dataType)) === l,
          s"scenario $scenario v$v layout drifted")
        val got = df.collect().map { r =>
          l.map { case (n, _) =>
            n -> (if (r.isNullAt(r.fieldIndex(n))) null else r.get(r.fieldIndex(n)))
          }.toMap
        }.toSet
        assert(got === m.values.toSet,
          s"scenario $scenario (seed ${seed + scenario}) version $v mismatch:\n" +
            s"  got   ${got.toSeq.map(_.toString).sorted.mkString("; ")}\n" +
            s"  model ${m.values.toSeq.map(_.toString).sorted.mkString("; ")}")
      }
    }
  }

  test("randomized lossy casts always fail loudly and leave the table untouched") {
    val rnd = new scala.util.Random(99L)
    for (_ <- 0 until 10) {
      val root = tmp()
      import spark.implicits._
      SnapshotTable.mergeByKey(spark, root,
        Seq((1L, 10L, "a")).toDF("k", "n", "s"), Seq("k"))
      val before = SnapshotTable.read(spark, root).collect().toSeq
      // a fractional double aimed at the LONG column — sometimes the
      // key, sometimes the value
      val frac = rnd.nextInt(50) + 0.5
      val df =
        if (rnd.nextBoolean()) Seq((frac, 20L, "b")).toDF("k", "n", "s")
        else Seq((2L, frac, "b")).toDF("k", "n", "s")
      val e = intercept[IllegalArgumentException] {
        SnapshotTable.mergeByKey(spark, root, df, Seq("k"))
      }
      assert(e.getMessage.contains("loses precision"))
      assert(SnapshotTable.currentVersion(root) === 1)
      assert(SnapshotTable.read(spark, root).collect().toSeq === before)
    }
  }
}
