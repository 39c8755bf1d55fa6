package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("exact dedup removes a planted duplicate, keeps min doc_id") {
    import spark.implicits._
    val d = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    assert(Dedup.exact(d).collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("PMI: an exclusive bigram outranks a chance co-occurrence") {
    import spark.implicits._
    // "new york" co-occur exclusively (separators break the back-edge);
    // "the cat"/"the dog" share "the" so each pairing is diluted:
    // pmi(new,york) = ln(3·17²/(15·3·3)) ≈ 1.86 > pmi(the,cat) ≈ 1.57
    val d = Seq(
      (0L, "new york x new york y new york z"),
      (1L, "the cat the dog the cat the dog")).toDF("doc_id", "text")
    val byName = TextAnalysis.pmiCollocations(d, minCount = 2, k = 10)
      .select("w1", "w2", "pmi").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(byName(("new", "york")) > byName(("the", "cat")),
      s"exclusive pair must outrank diluted pair: $byName")
    assert(byName(("new", "york")) > 0, "positive association must have pmi > 0")
  }

  test("minhash-LSH pairs equal the exact jaccard pairs on real docs (full recall)") {
    val exact = Dedup.jaccardPairs(docs, 3, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashPairs(docs, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain near-dups")
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("simhash: identical docs hamming 0; lightly-perturbed docs close") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val d = Seq((1L, base), (2L, base), (3L, base + "perturbed tail token"),
      (4L, "completely different content about databases and shuffles " * 6))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(d, maxHamming = 8).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 8)
    assert(!pairs.keySet.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("ann: planted near-duplicate embeddings found by LSH with exact cos") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    def vec(): Seq[Float] = Seq.fill(64)(rng.nextGaussian().toFloat)
    val base = vec()
    val near = base.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val rows = (0L until 50L).map(i => (i, vec())) :+ (100L, base) :+ (101L, near)
    val e = rows.toDF("vec_id", "embedding")
    val exact = Ann.neardupPairs(e, 0.95).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshNeardupPairs(e, 0.95).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((100L, 101L)))
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("ann ivfTopK: probed-list results are a faithful subset of brute force") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val brute = Ann.topK(emb, queryId = 3, k = 50).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = Ann.ivfTopK(emb, queryId = 3, k = 10, nlist = 8, nProbe = 4).collect()
    // self always found (its own list is the nearest probe), scores exact
    assert(ivf.head.getLong(0) == 3L)
    ivf.foreach { r =>
      brute.get(r.getLong(0)).foreach(b => assert(b == r.getDouble(1)))
    }
    // probing all lists == brute force exactly
    val full = Ann.ivfTopK(emb, queryId = 3, k = 10, nlist = 8, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val bruteTop = Ann.topK(emb, queryId = 3, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == bruteTop)
  }

  test("ann topK: self is rank 1 with cos 1.0") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val top = Ann.topK(emb, queryId = 3, k = 5).collect()
    assert(top.head.getLong(0) == 3L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    val scores = top.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("tokenCountBpe: letter/digit/punct runs split, hand-counted") {
    import spark.implicits._
    val d = Seq(
      (1L, "don't, stop me now"),    // don | ' | t | , | stop | me | now = 7
      (2L, "abc123 x-y"),            // abc | 123 | x | - | y = 5
      (3L, "   "),                   // whitespace only = 0
      (4L, "plain words here")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenCountBpe(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 7L, 2L -> 5L, 3L -> 0L, 4L -> 3L))
  }

  test("winnowFingerprints: guarantee — long shared substrings share a fingerprint") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog near the river bank"
    val d = Seq(
      (1L, s"prefix one $shared and a tail"),
      (2L, s"completely different opening here $shared closing words"),
      (3L, "no overlap with anything else at all in this document"),
      (4L, "tiny")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(d).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    // winnowing guarantee: a shared substring of length >= k+w-1 (11)
    // yields at least one shared fingerprint VALUE
    assert((fps(1L) & fps(2L)).nonEmpty)
    assert((fps(1L) & fps(3L)).isEmpty || (fps(2L) & fps(3L)).isEmpty)
    assert(!fps.contains(4L)) // shorter than k ⇒ no fingerprints
    // density: ~2/(w+1) of positions, never more than all windows
    val n1 = d.filter($"doc_id" === 1L).head.getString(1).length
    assert(fps(1L).size <= n1 - TextAnalysis.WinnowK + 1)
  }

  test("winnowFingerprints: codepoint semantics — supplementary chars count as one position") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog near the river bank"
    // same 4-codepoint prefix length; doc 2's prefix is 8 UTF-16 units
    val d = Seq(
      (1L, s"aaaa$shared"),
      (2L, s"😀😀😀😀$shared")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(d).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSet).toMap
    // deep inside the shared suffix (pos beyond any window touching the
    // prefix) the selected (pos, fp) pairs must be IDENTICAL — true only
    // if positions/hashes count codepoints, not UTF-16 code units
    val deep1 = fps(1L).filter(_._1 >= TextAnalysis.WinnowK)
    val deep2 = fps(2L).filter(_._1 >= TextAnalysis.WinnowK)
    assert(deep1.nonEmpty && deep1 == deep2)
    // pos is a codepoint offset: bounded by codepoint count, not char count
    val cpLen = 4 + shared.length
    assert(fps(2L).forall(_._1 <= cpLen - TextAnalysis.WinnowK))
  }

  test("sharedSpanPairs: copied passage detected, unrelated docs silent") {
    import spark.implicits._
    val span = "for the first time in recorded history the committee voted unanimously to adopt"
    val d = Seq(
      (1L, s"intro alpha beta $span gamma delta"),
      (2L, s"totally different words precede $span and follow after"),
      (3L, "independent content with no shared passage whatsoever in it")).toDF("doc_id", "text")
    val pairs = TextAnalysis.sharedSpanPairs(d, minShared = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("lmScore: hand-computed add-one bigram NLL, degenerate docs score 0") {
    import spark.implicits._
    val ref = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a b c"), (2L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(corpus, ref).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // ref: bigrams (a,b)x2 (b,a)x1; unigrams a:2 b:2; V=2
    // doc 1: (a,b): P=(2+1)/(2+2)=0.75; (b,c): OOV, P=(0+1)/(2+2)=0.25
    val nll = -(math.log(0.75) + math.log(0.25)) / 2
    assert(math.abs(got(1L)._1 - math.rint(nll * 1e4) / 1e4) < 1e-12)
    assert(got(1L)._2 == 0.5)
    assert(got(2L) == ((0.0, 0.0)))
    // self-scored real docs: every nll positive, oov fraction in [0,1]
    val real = TextAnalysis.lmScore(docs, docs).collect()
    assert(real.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("sq8: decode error bounded by (mx-mn)/510, self still rank 1, ranking near-exact") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // per-element decode error ≤ half a quantization step
    val err = Ann.quantizeSq8(emb)
      .join(emb, "vec_id")
      .select("vec_id", "code", "mn", "mx", "embedding")
      .as[(Long, Array[Byte], Float, Float, Array[Float])]
      .map { case (_, code, mn, mx, v) =>
        val step = (mx - mn).toDouble / 255.0
        code.indices.map { i =>
          val dq = mn + (code(i) & 0xff).toDouble / 255.0 * (mx - mn)
          math.abs(dq - v(i)) / math.max(step, 1e-12)
        }.max
      }.reduce(math.max _)
    // 1e-5 slack: the test recomputes the step in float32 arithmetic
    assert(err <= 0.5 + 1e-5, s"decode error $err steps")
    val top = Ann.topKSq8(emb, queryId = 3, k = 20).collect()
    assert(top.head.getLong(0) == 3L && math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    // quantization shifts ranks only within its error: strong overlap with
    // the exact top-k
    val exact = Ann.topK(emb, queryId = 3, k = 20).collect().map(_.getLong(0)).toSet
    val got = top.map(_.getLong(0)).toSet
    assert((exact & got).size >= 15, s"overlap ${(exact & got).size}")
  }

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 10k rows, 95% on one hot key
    val big = spark.range(10000)
      .selectExpr("id", "CASE WHEN id % 20 = 0 THEN id % 5 ELSE 99 END AS k")
    val small = Seq((99L, "hot"), (0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val plain = big.join(small, Seq("k")).groupBy("k", "v").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(big, small, "k", saltFactor = 8)
      .groupBy("k", "v").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("variant payload extraction: typed fields; absent path and malformed input are NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val raw = Seq(
      """{"topic": "emon/emonTx4", "payload": "{\"P1\": 7.5, \"time\": 12.25}"}""",
      """{"topic": "other/thing", "payload": "{\"volts\": 230}"}""",
      "not json at all"
    ).toDF("raw")
    val parsed = DynamicJson.parseEnvelopes(raw)
    val rows = parsed.select(col("topic"),
        DynamicJson.payloadField(col("v"), "$.P1", "double").as("p1"))
      .collect()
    val byTopic = rows.map(r => Option(r.getString(0)) -> Option(r.get(1))).toMap
    assert(byTopic(Some("emon/emonTx4")) == Some(7.5))
    assert(byTopic(Some("other/thing")) == None)  // absent path → NULL, no error
    assert(byTopic(None) == None)                 // malformed row → NULL variant
  }

  test("text analysis: deterministic and sane on real docs") {
    val tc = TextAnalysis.tokenCount(docs).collect()
    assert(tc.forall(_.getLong(1) > 0))
    val q = TextAnalysis.qualityScore(docs).collect()
    assert(q.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
    val lang = TextAnalysis.langId(docs).collect()
    assert(lang.forall(r => Set("de", "en", "es", "fr", "zh").contains(r.getString(1))))
    val fp = TextAnalysis.fingerprint(docs).collect()
    assert(fp.map(_.getString(1)).forall(_.length == 32))
  }

  test("lineDedup: first occurrence wins, docs reassemble in order, fully-claimed docs vanish") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha\nbeta\ngamma"),
      (2L, "beta\ndelta"),      // beta claimed by doc 1 → only delta stays
      (3L, "alpha\ngamma"),     // both claimed by doc 1 → doc 3 disappears
      (4L, "zeta\nzeta")        // in-doc repeat: second zeta dropped too
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(d).collect().map(r => r.getLong(0) -> r.getString(1))
    assert(out.toSeq == Seq(
      1L -> "alpha\nbeta\ngamma",
      2L -> "delta",
      4L -> "zeta"))
    // partitioning must not change the outcome (global min key, not
    // arrival order)
    val out8 = Dedup.lineDedup(d.repartition(8)).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(out8.toSeq == out.toSeq)
  }

  test("lineDedup: a doc_id outside the packed-key range fails loudly, not with a wrapped key") {
    import spark.implicits._
    // doc_id·10⁵ + idx wraps a BIGINT silently for hash-scale ids — the
    // guard must raise instead of resolving "first occurrence" wrongly
    val d = Seq((Long.MaxValue / 2, "a\nb"), (1L, "a\nc")).toDF("doc_id", "text")
    val e = intercept[Exception] { Dedup.lineDedup(d).collect() }
    def causes(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ causes(t.getCause)
    assert(causes(e).exists(_.contains("packed line-key range")),
      causes(e).mkString(" | "))
  }

  test("lineDedupWithinDoc: intra-doc repeats collapse to first occurrence, docs never claim each other's lines") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha\nbeta\nalpha\ngamma\nbeta"), // repeats at 2 and 4 drop
      (2L, "alpha\nalpha\nalpha"),             // collapses to one line
      (3L, "beta\ndelta"),                     // no repeats → unchanged,
                                               // even though doc 1 has beta
      (4L, "solo")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedupWithinDoc(d).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(out.toSeq == Seq(
      1L -> "alpha\nbeta\ngamma",
      2L -> "alpha",
      3L -> "beta\ndelta",
      4L -> "solo"))
    // the dedup itself is map-only: no hash exchange anywhere (the only
    // exchange allowed is the presentation orderBy's range partitioning)
    val plan = Dedup.lineDedupWithinDoc(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"intra-doc dedup must not shuffle:\n$plan")
  }

  test("heavyHitters: exact thresholded counts on a skewed stream, partitioning-independent") {
    import spark.implicits._
    // 60% "hot", 20% "warm", the rest a long tail of 40 singles-per-doc
    // tokens; k=4 counters over 44 distinct tokens forces constant
    // Misra-Gries decrements
    val rows = (0 until 200).map { i =>
      val tail = s"t${i % 40}"
      (i.toLong, s"hot hot hot warm $tail")
    }
    for (parts <- Seq(1, 3, 8)) {
      val d = rows.toDF("doc_id", "text").repartition(parts)
      val out = TextAnalysis.heavyHitters(d, k = 4, minFreq = 0.21)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      // N = 1000; threshold = ceil(210) = 210 → hot (600) and warm (200)?
      // warm is 200 < 210 → only hot survives, with its EXACT count
      assert(out.toSeq == Seq("hot" -> 600L), s"parts=$parts: ${out.toSeq}")
    }
    // lower threshold (still > 1/(k+1) with k=9): warm passes too
    val both = TextAnalysis.heavyHitters(
      rows.toDF("doc_id", "text").repartition(5), k = 9, minFreq = 0.15)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(both.toSeq == Seq("hot" -> 600L, "warm" -> 200L))
    // guarantee precondition is enforced
    intercept[IllegalArgumentException] {
      TextAnalysis.heavyHitters(rows.toDF("doc_id", "text"), k = 4, minFreq = 0.1)
    }
  }

  test("repetitionSignals: hand-computed fractions, degenerate docs score 0") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a a"),        // 4 tokens 1 distinct; bigrams: "a a"×3; trigrams: "a a a"×2, 1 distinct
      (2L, "w x y z"),        // all unique
      (3L, "solo"),           // no bigrams/trigrams
      (4L, "p q p q p q")     // 6 tok 2 distinct; bigrams: pq×3 qp×2 → top 3/5; trigrams: pqp×2 qpq×2 → dup 2/4
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(d).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(1L) == ((0.75, 1.0, 0.5)))
    assert(got(2L) == ((0.0, 0.333333, 0.0))) // round-6 of 1/3
    assert(got(3L) == ((0.0, 0.0, 0.0)))
    assert(got(4L) == ((0.666667, 0.6, 0.5))) // round-6 of 4/6
    val real = TextAnalysis.repetitionSignals(docs).collect()
    assert(real.forall { r =>
      (1 to 3).forall(i => r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0)
    })
  }

  test("gopherRules: each rule fails on its planted violator, clean doc passes") {
    import spark.implicits._
    val filler = (1 to 60).map(_ % 9).map(i =>
      Seq("the", "cat", "runs", "fast", "and", "dog", "naps", "in", "sun")(i))
      .mkString(" ") // 60 clean words incl. stopwords
    val d = Seq(
      (1L, filler),                                        // passes all
      (2L, "too short but the and of fine words here"),    // < 50 words
      (3L, (1 to 60).map(_ => "aa").mkString(" ") + " the and"), // mean len < 3
      (4L, (1 to 60).map(i => s"##$i").mkString(" ") + " the and"), // symbols + alpha
      (5L, (1 to 60).map(i => s"w$i").mkString(" "))       // no stopwords
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(d)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6),
          r.getBoolean(7), r.getBoolean(8)))).toMap
    assert(got(1L)._6, s"clean doc must pass: ${got(1L)}")
    assert(!got(2L)._1 && !got(2L)._6, "short doc fails ok_words")
    assert(!got(3L)._2 && !got(3L)._6, "two-letter doc fails ok_mean_len")
    assert(!got(4L)._4 && !got(4L)._6, "symbol-heavy doc fails ok_symbols")
    assert(!got(5L)._5 && !got(5L)._6, "stopword-free doc fails ok_stops")
  }

  test("ngramNovelty: hand-computed first-occurrence fractions") {
    import spark.implicits._
    // doc 1: 3 trigrams (a b c, b c d, c d e), all first → novelty 1.
    // doc 2: exact copy → 0 of 3 first → novelty 0.
    // doc 3: shares "a b c" (seen in doc 1), adds "b c x" → 1 of 2 new.
    // doc 4: two words → no shingles → absent.
    val d = Seq((1L, "a b c d e"), (2L, "a b c d e"),
      (3L, "a b c x"), (4L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(
      1L -> ((3L, 3L, 1.0)),
      2L -> ((3L, 0L, 0.0)),
      3L -> ((2L, 1L, 0.5))), s"got $got")
  }

  test("ngramNovelty: within-doc repeats count once; result is partition-count independent") {
    import spark.implicits._
    // "a b c" appears twice inside doc 1 — distinct shingles, so nsh = 3
    val d = Seq((1L, "a b c a b c"), (2L, "a b c z z z")).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(d.repartition(7))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1 shingles: {a b c, b c a, c a b} all new; doc 2: {a b c(seen),
    // b c z, c z z, z z z} → 3 of 4 new
    assert(got == Map(1L -> ((3L, 3L)), 2L -> ((4L, 3L))), s"got $got")
  }
}
