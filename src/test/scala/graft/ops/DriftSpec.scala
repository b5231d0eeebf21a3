package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-4 operator specs: divergence algebra, SymSpell recall,
  * BM25 ordering, containment asymmetry. The DuckDB gate pins
  * cross-engine numerics; these pin the semantics the gate can't see.
  */
class DriftSpec extends SparkTestBase {

  test("tokenDivergence: KL/JS ≥ 0; a corpus-shaped group has zero drift") {
    import spark.implicits._
    // group "all" holds the corpus-proportional text; "skew" is all-a
    val d = Seq(
      ("all", "a a a b b c"), ("all", "a a a b b c"),
      ("skew", "a a a a a a")).toDF("source", "text")
    val out = Drift.tokenDivergence(d, "source", "text")
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val (klSkew, jsSkew) = out("skew")
    assert(klSkew > 0 && jsSkew > 0, s"skewed group must drift: $out")
    // JS is bounded by ln 2
    assert(jsSkew <= math.log(2.0) + 1e-9)
    // a group whose distribution equals its own share of the corpus
    // still differs from the MIXED corpus here (corpus includes skew);
    // exact-zero case: one group == whole corpus
    val solo = Seq(("only", "a b c a")).toDF("source", "text")
    val z = Drift.tokenDivergence(solo, "source", "text").collect()(0)
    assert(math.abs(z.getDouble(2)) < 1e-9 && math.abs(z.getDouble(3)) < 1e-9,
      s"group == corpus must have zero divergence, got $z")
  }

  test("tokenDivergence: closed-form JS equals the naive full-vocab expansion") {
    import spark.implicits._
    val d = Seq(
      ("s1", "a a b c d"), ("s1", "b b e"),
      ("s2", "a c c c f"), ("s3", "g g g a b")).toDF("source", "text")
    val out = Drift.tokenDivergence(d, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // naive JS on the driver: full vocabulary per group, p=0 included
    val toks = d.as[(String, String)].collect()
      .flatMap { case (g, t) => t.split(" ").map(w => (g, w)) }
    val gw = toks.groupBy(identity).map { case ((g, w), v) => (g, w, v.length) }
    val tg = gw.groupBy(_._1).map { case (g, v) => g -> v.map(_._3).sum }
    val cw = gw.groupBy(_._2).map { case (w, v) => w -> v.map(_._3).sum }
    val tot = cw.values.sum.toDouble
    val vocab = cw.keySet
    for ((g, t) <- tg) {
      val pm = gw.filter(_._1 == g).map(x => x._2 -> x._3.toDouble / t).toMap
      val naive = vocab.toSeq.map { w =>
        val p = pm.getOrElse(w, 0.0)
        val q = cw(w) / tot
        val m = (p + q) / 2
        (if (p > 0) p * math.log(p / m) else 0.0) + q * math.log(q / m)
      }.sum / 2
      assert(math.abs(out(g) - naive) < 2e-6, // r6 pre-rounding tolerance
        s"closed form ${out(g)} != naive $naive for group $g")
    }
  }

  test("chiSquareCells: hand-computed 2x2 table; contributions sum to chi2") {
    import spark.implicits._
    // 2x2: rows (x: 30 a + 10 b), (y: 10 a + 30 b); classic chi2 = 20.0
    val d = (Seq.fill(30)(("x", "a")) ++ Seq.fill(10)(("x", "b")) ++
      Seq.fill(10)(("y", "a")) ++ Seq.fill(30)(("y", "b"))).toDF("r", "c")
    val cells = Drift.chiSquareCells(d, "r", "c").collect()
    assert(cells.length == 4)
    cells.foreach(r => assert(r.getDouble(3) == 20.0, s"expected 20, got $r"))
    val chi2 = cells.map(_.getDouble(4)).sum
    assert(math.abs(chi2 - 20.0) < 1e-6, s"chi2 $chi2 != 20")
  }

  test("edit1Pairs: exact recall vs brute force; distance-2 excluded") {
    import spark.implicits._
    val words = Seq("cat", "cut", "cats", "at", "dog", "dig", "dug",
      "hello", "hallo", "hullo", "help", "", "a", "b", "xy")
    val df = words.toDF("w")
    val got = EditSim.edit1Pairs(df, "w")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // brute force on the driver
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val want = (for {
      a <- words; b <- words if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(got == want,
      s"missing: ${want -- got}; spurious: ${got -- want}")
    // sanity on the classes: substitution, deletion, empty-vs-1-char
    assert(want.contains(("cat", "cut")) && want.contains(("at", "cat")) &&
      want.contains(("", "a")) && !want.contains(("cat", "dog")))
  }

  test("bm25: more query-term mass ranks higher; longer doc penalized at equal tf") {
    import spark.implicits._
    val d = Seq(
      (1L, "join join join filler filler"),
      (2L, "join filler filler filler filler"),
      (3L, "join filler filler filler filler filler filler filler filler"),
      (4L, "filler filler filler filler filler")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(d, "doc_id", "text", Seq("join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(4L), "doc without query terms must not score")
    assert(out(1L) > out(2L), s"tf=3 must beat tf=1: $out")
    assert(out(2L) > out(3L), s"shorter doc must beat longer at equal tf: $out")
  }

  test("containmentJoin: subset found in the asymmetric direction only; recall vs brute") {
    import spark.implicits._
    // doc 1 ⊂ doc 2 (all of 1's elements in 2); reverse direction dilute
    val d = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")),
      (3L, Seq("x", "y", "z"))).toDF("id", "elems")
    val out = SetSimJoin.containmentJoin(d, "id", col("elems"), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)), s"expected only 1→2 containment, got $out")
    // recall vs brute force on a randomized-ish overlapping fixture
    val docs = Seq(
      (10L, Seq("a", "b", "c", "d")), (11L, Seq("a", "b", "c", "d", "e")),
      (12L, Seq("b", "c", "d", "e")), (13L, Seq("a", "c", "d", "q")),
      (14L, Seq("q", "r", "s")), (15L, Seq("q", "r", "s", "t", "u")))
    val got = SetSimJoin.containmentJoin(docs.toDF("id", "elems"), "id",
      col("elems"), 0.75).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (ia, ea) <- docs; (ib, eb) <- docs if ia != ib
      c = ea.toSet.intersect(eb.toSet).size.toDouble / ea.toSet.size
      if c >= 0.75
    } yield (ia, ib)).toSet
    assert(got == want, s"missing: ${want -- got}; spurious: ${got -- want}")
  }

  test("containment positional filter prunes candidates without losing pairs") {
    import spark.implicits._
    // doc 1 shares its rarest element z with doc 2, but z sits LAST in
    // doc 2's ranking with nothing after it: the positional bound
    // min(pa−1,qb−1)+1+min(|A|−pa,|B|−qb) = 1 < ⌈t·|A|⌉ = 3 kills the
    // (1,2) candidate the prefix join alone would emit; the w-sharing
    // docs (real ≥ t pairs) survive the bound
    val docs = Seq(
      (1L, Seq("z", "w1", "w2", "w3")),
      (2L, Seq("u1", "u2", "u3", "u4", "u5", "u6", "u7", "u8", "z")),
      (3L, Seq("w1", "w2", "w3", "f3")),
      (4L, Seq("w1", "w2", "w3", "f4")),
      (5L, Seq("w1", "w2", "w3", "f5")))
    val sets = docs.toDF("_id", "elems")
    val t = 0.75
    val withPos = SetSimJoin.containmentCandidates(sets, t).count()
    val without = SetSimJoin.containmentCandidates(sets, t,
      positional = false).count()
    assert(withPos < without,
      s"positional filter pruned nothing: $withPos vs $without")
    // and the FINAL result equals brute force (recall intact)
    val got = SetSimJoin.containmentJoin(sets, "_id", col("elems"), t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (ia, ea) <- docs; (ib, eb) <- docs if ia != ib
      c = ea.toSet.intersect(eb.toSet).size.toDouble / ea.toSet.size
      if c >= t
    } yield (ia, ib)).toSet
    assert(got == want, s"missing: ${want -- got}; spurious: ${got -- want}")
  }

  test("pmiBigrams: hand-computed PMI, ordering, and minCount filter") {
    import spark.implicits._
    // one doc "a b a b ...": 10 tokens (a×5, b×5), 9 bigrams
    // ((a,b)×5, (b,a)×4) → pmi(a,b) = ln((5/9)/(0.5·0.5)),
    // pmi(b,a) = ln((4/9)/0.25)
    val d = Seq(Tuple1("a b a b a b a b a b")).toDF("text")
    val out = TextAnalysis.pmiBigrams(d, "text", minCount = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))
    assert(out.length == 2, out.mkString(", "))
    val (w1, w2, c, p) = out.head
    assert((w1, w2, c) == ("a", "b", 5L))
    assert(math.abs(p - math.log((5.0 / 9) / 0.25)) < 1e-5, p.toString)
    assert(math.abs(out(1)._4 - math.log((4.0 / 9) / 0.25)) < 1e-5)
    // rare pair below minCount never surfaces
    val d2 = Seq(Tuple1("a b a b a b a b a b"), Tuple1("z q")).toDF("text")
    val pairs = TextAnalysis.pmiBigrams(d2, "text", minCount = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!pairs.contains(("z", "q")), pairs.toString)
  }

  test("unigramEntropy: zero for constant docs, ln(n) for all-distinct") {
    import spark.implicits._
    val d = Seq((1L, "a a a a"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramEntropy(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((4L, 1L, 0.25, 0.0)), out(1L).toString)
    val (n, t, ttr, h) = out(2L)
    assert((n, t, ttr) == ((4L, 4L, 1.0)))
    assert(math.abs(h - math.log(4.0)) < 1e-5, h.toString)
  }

  test("ksStatistic: 0 for equal samples, 1 for disjoint, 0.5 half-shift") {
    import spark.implicits._
    def ks(a: Seq[Double], b: Seq[Double]) = {
      val df = (a.map(_ -> "a") ++ b.map(_ -> "b")).toDF("v", "g")
      val r = Drift.ksStatistic(df, "v", "g", "a", "b").collect()(0)
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    }
    assert(ks(Seq(1, 2, 3), Seq(1, 2, 3)) == ((3L, 3L, 0.0, 1.0)))
    assert(ks(Seq(1, 2), Seq(10, 11)) == ((2L, 2L, 1.0, 2.0)))
    // a=(1..4), b=(3..6): max gap 0.5 first attained at v=2
    assert(ks(Seq(1, 2, 3, 4), Seq(3, 4, 5, 6)) == ((4L, 4L, 0.5, 2.0)))
  }
}
