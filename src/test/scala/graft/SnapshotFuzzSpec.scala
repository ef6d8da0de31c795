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

  /** VERDICT r10 item 1: the commitPartitions FILE-LINK FAST PATH
    * interleaved with the rest of the snapshot feature matrix —
    * deletion-vector deletes, keyed merges (with schema evolution),
    * restore, compactFiles, compactLog, CHECK constraints, and vacuum
    * — in one randomized scenario stream against the in-memory model.
    * The r10b lost-update bug was exactly a composition hole
    * (fast path × concurrent claim); each singleton interaction has a
    * pinned spec (SnapshotPartmapSpec), but only a generator explores
    * SEQUENCES like slice → delete → slice (DV must kill the map,
    * slow compose must not resurrect deleted rows) → restore (map
    * returns) → slice (fast path again, linking files minted three
    * eras ago).
    *
    * Invariants checked per scenario:
    *   - every non-vacuumed version time-travels to the model
    *     (content + layout), vacuumed versions refuse loudly;
    *   - `_partmap` exists exactly when the model says the fast path
    *     is live (born sliced, killed by DV/merge/compact/flat,
    *     resurrected by restore-to-mapped-version);
    *   - partmap INTEGRITY: reading only the files mapped to a
    *     partition's token yields exactly that partition's model rows
    *     (file→token attribution — the thing that, if wrong, silently
    *     duplicates or drops a partition at the next slice);
    *   - constraint-violating slices abort atomically;
    *   - `_staging` is empty at scenario end (no leaked data-sized
    *     temp dirs from any abort path);
    *   - CDC (changesByKey) between random alive version pairs
    *     matches the model feed.
    */
  test("60 randomized slice/DV/merge/restore/compact/vacuum scenarios match the model") {
    import java.nio.file.{Files, Paths}
    val seed = 20260815L
    for (scenario <- 0 until 60) {
      val rnd = new scala.util.Random(seed + scenario)
      val root = tmp()

      // partition column type — all four token-safe families,
      // including Double (bit-pattern tokens, r11)
      val pType: DataType =
        Seq(IntegerType, LongType, StringType, DoubleType)(rnd.nextInt(4))
      def pVal(i: Int): Any = pType match {
        case StringType => s"p$i"
        case DoubleType => i + 0.25
        case LongType   => i.toLong * 1000L
        case _          => i
      }
      val pUniverse: IndexedSeq[Any] = (0 until 6).map(pVal)
      def pLit(v: Any): String = v match {
        case s: String => s"'$s'"
        case x => x.toString
      }
      def tokenStr(p: Any): String = "p=" + (p match {
        case d: java.lang.Double =>
          "d" + java.lang.Long.toHexString(java.lang.Double.doubleToLongBits(d))
        case x => x.toString
      })
      val colType: Map[String, DataType] =
        Map("p" -> pType, "k" -> IntegerType, "v" -> LongType, "e" -> LongType)

      // ---- model state --------------------------------------------
      var layout: Seq[String] = Seq("p", "k", "v")
      var rows: Map[(Any, Int), Map[String, Any]] = Map.empty
      var pmLive = false
      var history = Map.empty[Int, (Seq[String], Map[(Any, Int), Map[String, Any]], Boolean)]
      var alive = Set.empty[Int]

      def snap(): Unit = {
        val cv = SnapshotTable.currentVersion(root)
        history += cv -> ((layout, rows, pmLive))
        alive += cv
      }
      def mkDf(cols: Seq[String], rs: Seq[Map[String, Any]]): DataFrame =
        buildDf(cols.map(n => n -> colType(n)), rs.map(m => cols.map(m(_))))
      def genRow(p: Any, k: Int): Map[String, Any] = {
        val base = Map[String, Any]("p" -> p, "k" -> k,
          "v" -> rnd.nextInt(100).toLong)
        if (layout.contains("e")) base + ("e" -> rnd.nextInt(100).toLong)
        else base
      }

      def sliceOp(): Unit = {
        val before = SnapshotTable.currentVersion(root)
        val parts = rnd.shuffle(pUniverse).take(1 + rnd.nextInt(3))
        val newRows: Map[(Any, Int), Map[String, Any]] = parts.flatMap { p =>
          rnd.shuffle((0 until 5).toList).take(1 + rnd.nextInt(3))
            .map(k => (p, k) -> genRow(p, k))
        }.toMap
        SnapshotTable.commitPartitions(spark, root,
          mkDf(layout, newRows.values.toSeq), "p",
          readVersion = if (before == 0) -1 else before)
        rows = rows.filterNot { case ((p, _), _) => parts.contains(p) } ++ newRows
        if (before == 0) pmLive = true // born sliced; else fast/slow keeps flag
        snap()
      }

      def deleteOp(): Unit = {
        if (SnapshotTable.currentVersion(root) >= 1) {
          val (pred, fn): (String, Map[String, Any] => Boolean) =
            rnd.nextInt(3) match {
              case 0 =>
                val k = rnd.nextInt(5); (s"k = $k", r => r("k") == k)
              case 1 =>
                ("v % 2 = 0", r => r("v").asInstanceOf[Long] % 2 == 0)
              case _ =>
                val p = pUniverse(rnd.nextInt(pUniverse.length))
                (s"p = ${pLit(p)}", r => r("p") == p)
            }
          SnapshotTable.deleteWhere(spark, root, pred)
          rows = rows.filterNot { case (_, r) => fn(r) }
          pmLive = false // deleteWhere links data files but not the map
          snap()
        }
      }

      def mergeOp(withEvo: Boolean): Unit = {
        val includeE = (withEvo || layout.contains("e"))
        val srcCols = if (includeE) Seq("p", "k", "v", "e") else Seq("p", "k", "v")
        val keys = rnd.shuffle(for { p <- pUniverse; k <- 0 until 5 } yield (p, k))
          .take(1 + rnd.nextInt(4))
        val srcRows: Map[(Any, Int), Map[String, Any]] = keys.map { case (p, k) =>
          val m = Map[String, Any]("p" -> p, "k" -> k,
            "v" -> rnd.nextInt(100).toLong) ++
            (if (includeE) Map[String, Any]("e" -> rnd.nextInt(100).toLong)
             else Map.empty[String, Any])
          (p, k) -> m
        }.toMap
        SnapshotTable.mergeByKey(spark, root,
          mkDf(srcCols, srcRows.values.toSeq), Seq("p", "k"))
        if (includeE && !layout.contains("e")) layout = layout :+ "e"
        rows = rows.map { case (key, old) =>
          key -> (srcRows.get(key) match {
            case Some(src) =>
              layout.map(n => n -> src.getOrElse(n, old.getOrElse(n, null))).toMap
            case None => layout.map(n => n -> old.getOrElse(n, null)).toMap
          })
        } ++ srcRows.view.filterKeys(k => !rows.contains(k)).map {
          case (key, src) =>
            key -> layout.map(n => n -> src.getOrElse(n, null)).toMap
        }.toMap
        pmLive = false // flat commit: map gone, slow path until restore
        snap()
      }

      def restoreOp(): Unit = {
        val cands = alive.toSeq.sorted
        if (cands.nonEmpty) {
          val target = cands(rnd.nextInt(cands.length))
          SnapshotTable.restore(spark, root, target)
          val (l, m, pm) = history(target)
          layout = l; rows = m; pmLive = pm // restore hard-links _partmap too
          snap()
        }
      }

      def compactOp(): Unit = {
        if (SnapshotTable.currentVersion(root) >= 1) {
          SnapshotTable.compactFiles(spark, root)
          pmLive = false // rewrite drops file→token attribution
          snap()
        }
      }

      def constraintRejectOp(): Unit = {
        if (SnapshotTable.currentVersion(root) >= 1) {
          SnapshotTable.addConstraint(root, "fuzz_nonneg", "v >= 0")
          try {
            val before = SnapshotTable.currentVersion(root)
            val contentBefore = SnapshotTable.read(spark, root).collect().toSet
            val p = pUniverse(rnd.nextInt(pUniverse.length))
            val bad = genRow(p, 0) + ("v" -> (-1L))
            intercept[SnapshotTable.ConstraintViolation] {
              SnapshotTable.commitPartitions(spark, root,
                mkDf(layout, Seq(bad)), "p", readVersion = before)
            }
            assert(SnapshotTable.currentVersion(root) === before,
              s"scenario $scenario: rejected slice moved the head")
            assert(SnapshotTable.read(spark, root).collect().toSet === contentBefore,
              s"scenario $scenario: rejected slice changed content")
          } finally SnapshotTable.dropConstraint(root, "fuzz_nonneg")
        }
      }

      def vacuumOp(): Unit = {
        if (SnapshotTable.currentVersion(root) >= 1) {
          val dropped = SnapshotTable.vacuum(root, 1 + rnd.nextInt(2))
          alive --= dropped
        }
      }

      // ---- run: always born sliced (partmap table) -----------------
      sliceOp()
      val nOps = 4 + rnd.nextInt(3)
      for (_ <- 0 until nOps) rnd.nextInt(12) match {
        case 0 | 1 | 2 | 3 => sliceOp()
        case 4 | 5         => deleteOp()
        case 6             => mergeOp(withEvo = rnd.nextBoolean())
        case 7             => restoreOp()
        case 8             => compactOp()
        case 9             => constraintRejectOp()
        case 10            => SnapshotTable.compactLog(root); ()
        case _             => vacuumOp()
      }

      // ---- verify: every alive version time-travels to the model ---
      def rowSet(df: DataFrame, l: Seq[String]): Set[Map[String, Any]] =
        df.collect().map { r =>
          l.map { n =>
            n -> (if (r.isNullAt(r.fieldIndex(n))) null else r.get(r.fieldIndex(n)))
          }.toMap
        }.toSet
      for (v <- alive.toSeq.sorted) {
        val (l, m, pm) = history(v)
        val df = SnapshotTable.read(spark, root, v)
        assert(df.schema.map(_.name) === l,
          s"scenario $scenario v$v layout drifted")
        assert(rowSet(df, l) === m.values.toSet,
          s"scenario $scenario (seed ${seed + scenario}) v$v content mismatch")
        val pmFile = Paths.get(root, s"v=$v", "_partmap")
        assert(Files.exists(pmFile) === pm,
          s"scenario $scenario v$v partmap presence: expected $pm")
        if (pm) {
          // partmap integrity: token t's files hold exactly partition
          // t's model rows (and nothing else)
          val entries = Files.readString(pmFile).linesIterator
            .filter(ln => ln.nonEmpty && !ln.startsWith("#col"))
            .map { ln => val i = ln.indexOf('\t'); (ln.take(i), ln.drop(i + 1)) }
            .toSeq
          val byTok = entries.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
          val modelToks = m.values.groupBy(r => tokenStr(r("p")))
          assert(byTok.keySet === modelToks.keySet,
            s"scenario $scenario v$v partmap tokens ${byTok.keySet} != model ${modelToks.keySet}")
          for ((tok, files) <- byTok) {
            val got = rowSet(spark.read.parquet(
              files.map(f => Paths.get(root, s"v=$v", f).toString): _*), l)
            assert(got === modelToks(tok).toSet,
              s"scenario $scenario v$v token $tok attribution mismatch")
          }
        }
      }
      // vacuumed versions refuse loudly
      for (v <- history.keys if !alive(v))
        intercept[IllegalArgumentException] {
          SnapshotTable.read(spark, root, v)
        }
      // no abort path leaked a staging dir
      val stagingDir = Paths.get(root, "_staging")
      if (Files.exists(stagingDir)) {
        val s = Files.list(stagingDir)
        val leftovers = try {
          val it = s.iterator(); val b = Seq.newBuilder[String]
          while (it.hasNext) b += it.next().getFileName.toString
          b.result()
        } finally s.close()
        assert(leftovers.isEmpty,
          s"scenario $scenario leaked staging entries: $leftovers")
      }

      // ---- CDC between random alive version pairs ------------------
      val vs = alive.toSeq.sorted
      val pairs = Seq.fill(2)((vs(rnd.nextInt(vs.length)), vs(rnd.nextInt(vs.length))))
        .collect { case (a, b) if a < b => (a, b) }.distinct
      for ((v1, v2) <- pairs) {
        val (l1, m1, _) = history(v1)
        val (l2, m2, _) = history(v2)
        val ul = l1 ++ l2.filterNot(l1.contains)
        def pad(r: Map[String, Any]): Map[String, Any] =
          ul.map(n => n -> r.getOrElse(n, null)).toMap
        val k1 = m1.keySet; val k2 = m2.keySet
        val expected: Set[(Map[String, Any], String)] =
          (k2 -- k1).map(k => (pad(m2(k)), "insert")) ++
            (k1 -- k2).map(k => (pad(m1(k)), "delete")) ++
            (k1 & k2).filter(k => pad(m1(k)) != pad(m2(k)))
              .flatMap(k => Seq((pad(m1(k)), "update_preimage"),
                (pad(m2(k)), "update_postimage")))
        val got = SnapshotTable.changesByKey(spark, root, v1, v2, Seq("p", "k"))
          .collect().map { r =>
            (ul.map { n =>
              n -> (if (r.isNullAt(r.fieldIndex(n))) null else r.get(r.fieldIndex(n)))
            }.toMap, r.getString(r.fieldIndex("_change_type")))
          }.toSet
        assert(got === expected,
          s"scenario $scenario (seed ${seed + scenario}) cdc $v1->$v2 mismatch")
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
