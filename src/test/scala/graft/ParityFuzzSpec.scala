package graft

import graft.ops.Packing
import graft.text.TextOps
import org.apache.spark.sql.functions.col

import scala.util.Random

/** Seeded-random parity fuzzing for the three scale-path rewrites that
  * CLAIM exact equivalence to their originals. Hand cases pin the
  * shapes we thought of; these trials sweep inputs we didn't. Seeds
  * are FIXED — every run tests the same inputs (no flaky CI), chosen
  * small enough that the whole suite stays in seconds but adversarial
  * enough to hit ties, token collisions, shard edges and empty
  * groups. */
class ParityFuzzSpec extends SparkSpec {
  import spark.implicits._

  // tiny alphabet + short words = dense pair-count TIES and shared
  // tokens between top candidates — the paths where batched training
  // must refuse to batch
  private def randomCorpus(rnd: Random, docs: Int): Seq[(Long, String)] =
    (0 until docs).map { i =>
      val words = (0 until 1 + rnd.nextInt(12)).map { _ =>
        (0 until 1 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar)
          .mkString
      }
      (i.toLong, words.mkString(" "))
    }

  test("fuzz: batched BPE training == sequential on tie-dense corpora") {
    for (trial <- 0 until 6) {
      val rnd = new Random(1000 + trial)
      val df = randomCorpus(rnd, 4 + rnd.nextInt(4)).toDF("doc_id", "text")
      val nm = 3 + rnd.nextInt(6)
      val seq = TextOps.trainBpe(df, "text", nm)
      val bat = TextOps.trainBpeBatched(df, "text", nm,
        maxBatch = 1 + rnd.nextInt(8), candidatePool = 16)
      assert(bat == seq, s"trial $trial (numMerges=$nm) diverged")
    }
  }

  test("fuzz: partitioned greedy segmentation == replace chain on random tables") {
    for (trial <- 0 until 4) {
      val rnd = new Random(2000 + trial)
      val train = randomCorpus(rnd, 6).toDF("doc_id", "text")
      val apply = randomCorpus(new Random(3000 + trial), 8)
        .toDF("doc_id", "text")
      val merges = TextOps.trainBpe(train, "text", 3 + rnd.nextInt(5))
      val key = (r: (Long, Long, String)) => r._1
      val chain = TextOps.withBpeSegmentation(apply, "text", merges, "seg", "n")
        .select("doc_id", "n", "seg")
        .as[(Long, Long, String)].collect().sortBy(key).toSeq
      val part = TextOps
        .withBpeSegmentationPartitioned(apply, "text", merges, "seg", "n")
        .select("doc_id", "n", "seg")
        .as[(Long, Long, String)].collect().sortBy(key).toSeq
      assert(part == chain, s"trial $trial diverged")
    }
  }

  test("fuzz: sharded packing == plain across random groups/ids/blocks") {
    for (trial <- 0 until 8) {
      val rnd = new Random(4000 + trial)
      val rows = (0 until 5 + rnd.nextInt(40)).map { _ =>
        (s"g${rnd.nextInt(4)}",
          rnd.nextLong().abs % 1000L,
          rnd.nextInt(30).toLong) // includes 0-token docs (must drop)
      }.distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val L = 1 + rnd.nextInt(16)
      val block = 1L + rnd.nextInt(100)
      val df = rows.toDF("g", "id", "n")
      val key = (r: (String, Long, Long, Long, Long)) => (r._1, r._2, r._3)
      val plain = Packing.packSequences(df, "id", "g", "n", L)
        .as[(String, Long, Long, Long, Long)].collect().sortBy(key).toSeq
      val sharded = Packing.packSequencesSharded(df, "id", "g", "n", L, block)
        .as[(String, Long, Long, Long, Long)].collect().sortBy(key).toSeq
      assert(sharded == plain, s"trial $trial (L=$L block=$block) diverged")
    }
  }

  test("fuzz: duplicated spans match an in-memory brute force") {
    def bruteSpans(docs: Seq[(Long, String)], n: Int)
        : Seq[(Long, Int, Int, Long)] = {
      val words = docs.map { case (id, t) =>
        id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      }.toMap
      val grams = words.toSeq.flatMap { case (id, ws) =>
        ws.sliding(n).zipWithIndex.collect {
          case (g, p) if g.length == n => (id, p, g.mkString(" "))
        }
      }
      val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2)
        .keySet
      grams.filter(g => dup(g._3)).groupBy(_._1).toSeq.flatMap {
        case (id, hs) =>
          val ps = hs.map(_._2).sorted
          val runs = ps.foldLeft(List.empty[List[Int]]) {
            case (acc, p) if acc.nonEmpty && p <= acc.head.head + n =>
              (p :: acc.head) :: acc.tail
            case (acc, p) => List(p) :: acc
          }
          runs.map(r => (id, r.min, r.max + n - 1, r.size.toLong))
      }.sortBy(r => (r._1, r._2))
    }
    for (trial <- 0 until 5) {
      val rnd = new Random(5000 + trial)
      val docs = (0 until 6).map { i =>
        val ws = (0 until 4 + rnd.nextInt(12)).map(_ =>
          ('a' + rnd.nextInt(4)).toChar.toString)
        (i.toLong, ws.mkString(" "))
      }
      val n = 2 + rnd.nextInt(2)
      val got = graft.text.SpanDedup.duplicatedSpans(
          docs.toDF("doc_id", "text"), "doc_id", "text", n)
        .as[(Long, Int, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got == bruteSpans(docs, n), s"trial $trial (n=$n) diverged")
    }
  }

  test("fuzz: line dedup == brute-force reference on random corpora") {
    def bruteRemove(docs: Seq[(Long, String)],
                    minDocs: Int): Seq[(Long, String, Long)] = {
      val lines = docs.flatMap { case (id, t) =>
        t.split("\n", -1).zipWithIndex.map { case (l, p) =>
          (id, p, l.trim)
        }
      }
      val byContent = lines.groupBy(_._3)
      val dup = byContent.collect {
        case (c, occ) if occ.map(_._1).distinct.size >= minDocs => c
      }.toSet
      val winner = byContent.map { case (c, occ) =>
        c -> occ.map(t => (t._1, t._2)).min
      }
      lines.filter { case (id, p, c) =>
        !dup.contains(c) || winner(c) == ((id, p))
      }.groupBy(_._1).map { case (id, ls) =>
        (id, ls.sortBy(_._2).map(_._3).mkString("\n"), ls.size.toLong)
      }.toSeq.sortBy(_._1)
    }
    for (trial <- 0 until 5) {
      val rnd = new Random(7000 + trial)
      // tiny line vocabulary → dense cross-doc collisions + within-doc
      // repeats + whitespace-padded variants of the same content
      val docs = (0 until 5 + rnd.nextInt(4)).map { i =>
        val nl = 1 + rnd.nextInt(5)
        val ls = (0 until nl).map { _ =>
          val core = "line " + ('a' + rnd.nextInt(4)).toChar
          if (rnd.nextBoolean()) s"  $core " else core
        }
        (i.toLong, ls.mkString("\n"))
      }
      val minDocs = 2 + rnd.nextInt(2)
      val got = graft.text.LineDedup.removeDuplicatedLines(
          docs.toDF("doc_id", "text"), "doc_id", "text", minDocs)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      assert(got == bruteRemove(docs, minDocs),
        s"trial $trial (minDocs=$minDocs) diverged")
    }
  }

  test("fuzz: fuzzy-join blocking is COMPLETE at maxDist 1 (vs all-pairs)") {
    // the documented guarantee: one edit cannot corrupt both disjoint
    // key zones — so blocked results must equal brute force exactly
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (trial <- 0 until 4) {
      val rnd = new Random(8000 + trial)
      def word() = (0 until 5 + rnd.nextInt(6))
        .map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
      val a = (0 until 12).map(i => (i.toLong, word() + " " + word()))
      // b: random edits of a-side strings (sub/insert/delete) + fresh
      val b = (0 until 12).map { i =>
        val base = a(rnd.nextInt(a.size))._2
        val p = rnd.nextInt(base.length)
        val s = rnd.nextInt(3) match {
          case 0 => base.updated(p, ('a' + rnd.nextInt(5)).toChar)
          case 1 => base.substring(0, p) + ('a' + rnd.nextInt(5)).toChar +
            base.substring(p)
          case _ if base.length > 4 =>
            base.substring(0, p) + base.substring(p + 1)
          case _ => base
        }
        (100L + i, s)
      }
      val blocked = graft.dedup.Fuzzy.fuzzyJoinAgainst(
          a.toDF("id_a", "s"), b.toDF("id_b", "s"),
          "id_a", "s", "id_b", "s", maxDist = 1)
        .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      val brute = (for {
        (ia, sa) <- a; (ib, sb) <- b
        d = lev(sa.toLowerCase.trim, sb.toLowerCase.trim) if d <= 1
      } yield (ia, ib, d.toLong)).sortBy(r => (r._1, r._2))
      assert(blocked == brute, s"trial $trial diverged")
      assert(brute.nonEmpty, s"trial $trial generated no pairs")
    }
  }

  test("fuzz: entity resolution equals the brute-force reference at maxDist 1") {
    // blocked resolveBatch vs an independent in-memory reference:
    // closest-master (dist, eid) assignment + union-find components
    // over the unmatched remainder. Short strings (len 3+) included —
    // the catch-all short-string key must hold the completeness line.
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (trial <- 0 until 3) {
      val rnd = new Random(9000 + trial)
      def word() = (0 until 3 + rnd.nextInt(8))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val master = (0 until 8).map(i => (i.toLong, word()))
      val batch = (0 until 14).map { i =>
        val s = if (rnd.nextBoolean() && master.nonEmpty) {
          val base = master(rnd.nextInt(master.size))._2
          val p = rnd.nextInt(base.length)
          if (rnd.nextBoolean()) base.updated(p, ('a' + rnd.nextInt(4)).toChar)
          else base.substring(0, p) + base.substring(math.min(p + 1, base.length))
        } else word()
        (100L + i, s)
      }
      val got = graft.dedup.EntityResolve.withResolvedBatch(
          batch.toDF("rid", "s"), master.toDF("eid", "s"),
          "rid", "s", "eid", "s", maxDist = 1) {
        _.as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      }

      // reference
      val matched = batch.flatMap { case (rid, s) =>
        val cands = master.map { case (eid, m) => (lev(s, m).toLong, eid) }
          .filter(_._1 <= 1)
        if (cands.isEmpty) None else {
          val best = cands.min
          Some((rid, best._2, best._1, true))
        }
      }
      val um = batch.filterNot(b => matched.exists(_._1 == b._1))
      // union-find over unmatched pairs
      val parent = scala.collection.mutable.Map(um.map(b => b._1 -> b._1): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      for ((ia, sa) <- um; (ib, sb) <- um if ia < ib && lev(sa, sb) <= 1) {
        val (ra, rb) = (find(ia), find(ib))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val fresh = um.map(b => (b._1, find(b._1), 0L, false))
      val expected = (matched ++ fresh).sortBy(_._1)
      assert(got == expected, s"trial $trial diverged:\n got=$got\n exp=$expected")
    }
  }

  test("fuzz: sharded packing with negative ids (truncating DIV still monotone)") {
    val rows = Seq(("g", -130L, 5L), ("g", -64L, 7L), ("g", -1L, 3L),
      ("g", 0L, 4L), ("g", 63L, 9L), ("g", 64L, 2L))
    val df = rows.toDF("g", "id", "n")
    val key = (r: (String, Long, Long, Long, Long)) => (r._1, r._2, r._3)
    val plain = Packing.packSequences(df, "id", "g", "n", 8)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(key).toSeq
    val sharded = Packing.packSequencesSharded(df, "id", "g", "n", 8, 64L)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(key).toSeq
    assert(sharded == plain)
  }
}
