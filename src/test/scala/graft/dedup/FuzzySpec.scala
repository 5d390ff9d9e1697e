package graft.dedup

import graft.SparkSpec

/** Fuzzy.fuzzyJoinAgainst — dual-pass blocking recall, band
  * straddling, verify threshold, dedupe of double-matched pairs.
  * q114 pins the corpus-scale join against DuckDB. */
class FuzzySpec extends SparkSpec with HotBucketLogCapture {
  import spark.implicits._

  private def join(a: Seq[(Long, String)], b: Seq[(Long, String)],
                   maxDist: Int): Seq[(Long, Long, Long)] =
    Fuzzy.fuzzyJoinAgainst(a.toDF("id_a", "s"), b.toDF("id_b", "s"),
        "id_a", "s", "id_b", "s", maxDist)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("prefix typo caught by the suffix pass and vice versa") {
    val a = Seq((1L, "golden widget"), (2L, "copper spring"))
    val b = Seq(
      (10L, "zolden widget"),   // first char swapped → suffix pass
      (11L, "copper sprinq"))   // last char swapped → prefix pass
    assert(join(a, b, maxDist = 1) ==
      Seq((1L, 10L, 1L), (2L, 11L, 1L)))
  }

  test("identical strings match at distance 0, once") {
    // both passes generate the pair; output must carry it once
    val out = join(Seq((1L, "alpha beta")), Seq((9L, "alpha beta")), 2)
    assert(out == Seq((1L, 9L, 0L)))
  }

  test("beyond maxDist is excluded even when blocks collide") {
    // same prefix and suffix, 3 edits apart
    val out = join(Seq((1L, "abxyzcd")), Seq((9L, "abuvwcd")), 2)
    assert(out == Seq.empty)
  }

  test("length-band straddle: deletions up to maxDist still match") {
    // len 12 vs len 10: bands 4 vs 3 — only the probe-side fan-out
    // of adjacent bands can generate this pair
    val out = join(Seq((1L, "golden widge")), Seq((9L, "golden wid")), 2)
    assert(out == Seq((1L, 9L, 2L)))
  }

  test("normalization: case and outer whitespace are ignored") {
    val out = join(Seq((1L, "  Golden Widget ")),
      Seq((9L, "golden widget")), 0)
    assert(out == Seq((1L, 9L, 0L)))
  }

  test("short strings: middle edit overlapping both zones still matches") {
    // len-3 strings: the 2-char prefix and suffix zones overlap, so a
    // single middle edit corrupts BOTH — only the catch-all short key
    // can generate these pairs.
    val out = join(Seq((1L, "cat"), (2L, "ox")),
      Seq((9L, "cut"), (8L, "ax")), 1)
    assert(out == Seq((1L, 9L, 1L), (2L, 8L, 1L)))
  }

  test("short-vs-longer straddle: len 3 vs len 4 at one indel") {
    val out = join(Seq((1L, "abc")), Seq((9L, "abcd")), 1)
    assert(out == Seq((1L, 9L, 1L)))
  }

  test("maxDist=2 recall contract: blocked join finds EVERY " +
      "brute-force pair on a 2-typo corpus") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdef" // small alphabet -> accidental near pairs too
    def randStr(): String = {
      val len = 8 + rnd.nextInt(7)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    def typo(s: String): String = {
      var cur = s
      (1 to 2).foreach { _ =>
        val p = rnd.nextInt(cur.length)
        rnd.nextInt(3) match {
          case 0 => cur = cur.substring(0, p) +
            alphabet(rnd.nextInt(alphabet.length)) + cur.substring(p + 1)
          case 1 if cur.length > 6 =>
            cur = cur.substring(0, p) + cur.substring(p + 1)
          case _ => cur = cur.substring(0, p) +
            alphabet(rnd.nextInt(alphabet.length)) + cur.substring(p)
        }
      }
      cur
    }
    val bases = (0 until 250).map(i => (i.toLong, randStr()))
    val variants = bases.map { case (i, s) => (1000L + i, typo(s)) }
    val rows = bases ++ variants
    // brute force in the DRIVER (spec-only oracle): 500^2 tiny DPs
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && math.abs(sa.length - sb.length) <= 2 && lev(sa, sb) <= 2
    } yield (ia, ib)).toSet
    assert(brute.size >= 250, s"fixture too sparse: ${brute.size} pairs")
    val df = rows.toDF("id", "s")
    val blocked = Fuzzy.fuzzyJoinAgainst(
        df.select(col("id").as("id_a"), col("s")),
        df.select(col("id").as("id_b"), col("s")),
        "id_a", "s", "id_b", "s", maxDist = 2)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // precision is structural (the Levenshtein verify runs on every
    // candidate); RECALL is the contract under test
    assert(blocked.subsetOf(brute), "verify let a far pair through")
    val missed = brute -- blocked
    info(s"brute pairs: ${brute.size}; blocked recall: " +
      f"${(brute.size - missed.size).toDouble / brute.size}%.4f")
    // strings are >= 6 chars, so the three-pass blocking is COMPLETE
    // at maxDist 2 (see Fuzzy's object doc) — the floor is 1.0
    assert(missed.isEmpty,
      s"${missed.size} missed pairs, e.g. ${missed.take(5)}")
  }

  test("maxDist=2 middle pass: both-end-corrupted pairs caught when " +
      "both strings >= 6 chars") {
    // prefix AND suffix zones edited (one indel each end): only the
    // preserved center window can generate the candidate
    val out = join(Seq((1L, "zabcdefq")), Seq((9L, "abcdef")), 2)
    assert(out == Seq((1L, 9L, 2L)))
    // and symmetric orientation
    val out2 = join(Seq((1L, "abcdef")), Seq((9L, "zabcdefq")), 2)
    assert(out2 == Seq((1L, 9L, 2L)))
  }

  test("maxDist=2 recall measured on a MIXED-LENGTH corpus: every " +
      "miss falls inside the documented (<=5, >=6) sliver") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdef"
    def randStr(): String = {
      val len = 4 + rnd.nextInt(8) // 4..11 straddles the len-6 edge
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    def typo(s: String): String = {
      var cur = s
      (1 to 2).foreach { _ =>
        val p = rnd.nextInt(cur.length)
        rnd.nextInt(3) match {
          case 0 => cur = cur.substring(0, p) +
            alphabet(rnd.nextInt(alphabet.length)) + cur.substring(p + 1)
          case 1 if cur.length > 4 =>
            cur = cur.substring(0, p) + cur.substring(p + 1)
          case _ => cur = cur.substring(0, p) +
            alphabet(rnd.nextInt(alphabet.length)) + cur.substring(p)
        }
      }
      cur
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val bases = (0 until 250).map(i => (i.toLong, randStr()))
    val rows = bases ++ bases.map { case (i, s) => (1000L + i, typo(s)) }
    val brute = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && math.abs(sa.length - sb.length) <= 2 && lev(sa, sb) <= 2
    } yield (ia, ib)).toSet
    val mixedBrute = brute.count { case (ia, ib) =>
      val byId = rows.toMap
      math.min(byId(ia).length, byId(ib).length) <= 5 &&
        math.max(byId(ia).length, byId(ib).length) >= 6
    }
    assert(brute.size >= 400 && mixedBrute >= 40,
      s"fixture too sparse: ${brute.size} pairs, $mixedBrute mixed")
    val df = rows.toDF("id", "s")
    val blocked = Fuzzy.fuzzyJoinAgainst(
        df.select(col("id").as("id_a"), col("s")),
        df.select(col("id").as("id_b"), col("s")),
        "id_a", "s", "id_b", "s", maxDist = 2)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked.subsetOf(brute), "verify let a far pair through")
    val missed = brute -- blocked
    val byId = rows.toMap
    info(f"mixed-length corpus: ${brute.size} brute pairs " +
      f"($mixedBrute mixed), ${missed.size} misses")
    // the widened catch-all cutoff (3 + 2*maxDist at maxDist >= 2)
    // makes blocking COMPLETE at every length mix — before it, this
    // seeded corpus measured recall 0.9373 with 52 misses, all mixed
    // (<=5, >=6) pairs with both short-side end zones edited
    assert(missed.isEmpty, s"${missed.size} missed, e.g. " +
      missed.take(5).map { case (ia, ib) =>
        s"(${byId(ia)}, ${byId(ib)})" }.mkString(", "))
  }

  test("the old mixed-length sliver is CLOSED: a (<=5, >=6) pair with " +
      "both end zones edited meets in the widened catch-all bucket") {
    // pre-v3 key scheme missed these (len 5 has no middle window and
    // len 7 sat past the old catch-all cutoff) — the round-12 pin
    // expected Seq.empty here; the widened cutoff pairs them
    assert(join(Seq((1L, "zabcdeq")), Seq((9L, "abcde")), 2) ==
      Seq((1L, 9L, 2L)))
    assert(join(Seq((1L, "abcde")), Seq((9L, "zabcdeq")), 2) ==
      Seq((1L, 9L, 2L)))
  }

  test("plan shape: the stored key artifact is probed by broadcasts, " +
      "never shuffled (the 100 TB registry contract)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val master = Seq((1L, "golden widget"), (2L, "copper spring"))
        .toDF("eid", "name")
      // the artifact as it exists in production: a STORED table (a
      // live entityKeys plan would drag its own construction join
      // into the corpus side of this explain)
      val dir = java.nio.file.Files.createTempDirectory("fkeys").toString
      Fuzzy.entityKeys(master, "eid", "name", 2)
        .write.mode("overwrite").parquet(dir)
      val keys = spark.read.parquet(dir)
      val batch = Seq((10L, "golden widgez")).toDF("rid", "name")
      val out = Fuzzy.fuzzyJoinAgainst(batch, master.limit(0),
        "rid", "name", "eid", "name", 2, corpusKeys = Some(keys))
      val p = out.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // registry-side columns never hash-exchange: the key probe and
      // the string fetch are broadcast joins (the per-key duplicate
      // rows collapse AFTER the candidate filter, so even the
      // artifact's dedup is candidate-scale); only batch-scale frames
      // may sort-merge
      assert(!p.contains("hashpartitioning(eid") &&
        !p.contains("hashpartitioning(_k"),
        "the registry artifact must not shuffle:\n" + p)
      assert(p.linesIterator.count(_.contains("BroadcastExchange")) >= 2,
        "batch keys and candidate pairs must broadcast:\n" + p)
      assert(out.as[(Long, Long, Long)].collect().toSeq ==
        Seq((10L, 1L, 1L)))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      "10485760")
  }

  test("hot blocks are dropped loudly at the cap; cold pairs survive") {
    // 30 probe names share prefix+suffix+band with 30 corpus names →
    // 2-char-key blocks of 30 rows each side; cap at 20 culls them
    // (loudly, on both sides), and the exact-equal pair in a COLD
    // block still comes through.
    val hotA = (1L to 30L).map(i => (i, f"aa${i}%03d1middlezz"))
    val hotB = (101L to 130L).map(i => (i, f"aa${i}%03d2middlezz"))
    val a = hotA :+ (50L -> "unique cold name")
    val b = hotB :+ (150L -> "unique cold name")
    val (out, logs) = withLogCapture {
      Fuzzy.fuzzyJoinAgainst(a.toDF("id_a", "s"),
          b.toDF("id_b", "s"), "id_a", "s", "id_b", "s",
          maxDist = 1, maxBucket = 20)
        .as[(Long, Long, Long)].collect().toSeq
    }
    assert(out == Seq((50L, 150L, 0L)))
    assert(logs.exists(_.contains("fuzzyJoinAgainst(probe)")))
    assert(logs.exists(_.contains("fuzzyJoinAgainst(corpus)")))
  }
}
