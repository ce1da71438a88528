package graft

import org.apache.spark.sql.functions._

class TextSpec extends GraftSpecBase {
  import spark.implicits._

  test("repetition score: duplicated 3-grams and dominant-token run both detected") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),              // 6 tokens, 4 identical 3-grams
      (2L, "one two three four five six"),                // all distinct
      (3L, "go go stop go go stop go go stop")).toDF("doc_id", "text")
    val r = text.TextAnalysis.repetitionScore(df).orderBy("doc_id").collect()
    // doc 1: 4 3-grams, 1 distinct → dup 0.75; top token run 6/6
    assert(r(0).getDouble(2) == 0.75 && r(0).getInt(3) == 6 && r(0).getDouble(4) == 1.0)
    // doc 2: nothing repeats
    assert(r(1).getDouble(2) == 0.0 && r(1).getInt(3) == 1)
    // doc 3: 9 tokens, 7 3-grams of 3 distinct patterns → dup 4/7; 'go' x6 of 9
    assert(math.abs(r(2).getDouble(2) - 4.0 / 7) < 1e-6)
    assert(r(2).getInt(3) == 6 && math.abs(r(2).getDouble(4) - 6.0 / 9) < 1e-6)
  }

  test("degenerate docs (empty / whitespace-only / single-token) never crash the text family") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "word"), (4L, "a b"))
      .toDF("doc_id", "text")
    // every operator must return one row per doc with no exception;
    // score semantics on degenerate input may be null, never a crash
    assert(text.TextAnalysis.tokenCounts(df).count() == 4)
    assert(text.TextAnalysis.repetitionScore(df).count() == 4)
    assert(text.TextAnalysis.fingerprint(df).count() == 4)
    assert(text.Curation.piiRedact(df).count() == 4)
    assert(df.select(text.Curation.normalizeRedact(col("text"))).count() == 4)
    val q = text.TextAnalysis.qualityScore(df).collect()
    assert(q.length == 4)
    // shingle/minhash ops: no shingles → no pairs, docs stay singletons
    assert(dedup.Dedup.minhashLshPairs(df).count() == 0)
    assert(dedup.Dedup.exactJaccardPairs(df).count() == 0)
  }

  test("t9 gopher rules: each structural rule fires on its crafted violator only") {
    val fifty = (1 to 50).map(i => s"the and of word$i").mkString(" ") // 250 words, stopword-rich
    val df = Seq(
      (1L, fifty),                                       // passes everything
      (2L, "the and of too short"),                      // word count < 50
      (3L, (1 to 60).map(_ => "### #!# #?#").mkString(" ")), // symbols, no alpha, no stopwords
      (4L, (1 to 30).map(i => s"- the bullet of line$i\n").mkString ++ "tail"), // bullet lines
      (5L, (1 to 30).map(i => s"the trailing of thing$i...\n").mkString ++ "tail")) // ellipsis lines
      .toDF("doc_id", "text")
    val r = text.TextAnalysis.gopherRules(df).orderBy("doc_id").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Boolean]("keep"), s"clean doc must pass: ${r(1L)}")
    assert(!r(2L).getAs[Boolean]("keep") && r(2L).getAs[Long]("n_words") == 5L)
    val d3 = r(3L)
    assert(d3.getAs[Double]("symbol_ratio") > 0.1
      && d3.getAs[Double]("alpha_ratio") < 0.8
      && d3.getAs[Long]("n_req_stopwords") == 0L
      && !d3.getAs[Boolean]("keep"))
    assert(r(4L).getAs[Double]("bullet_ratio") > 0.9 && !r(4L).getAs[Boolean]("keep"))
    assert(r(5L).getAs[Double]("ellipsis_ratio") > 0.3 && !r(5L).getAs[Boolean]("keep"))
  }

  test("t10 token entropy: hand-computed frequencies; degenerate docs null, uniform docs max") {
    val df = Seq(
      (1L, "a a b"),          // H = ln3 - (2ln2)/3
      (2L, "x y z w"),        // uniform: H = ln4, efficiency 1.0
      (3L, "same same same"), // zero entropy
      (4L, "word"),           // n=1 → H=0, efficiency null
      (5L, "")).toDF("doc_id", "text")
    val r = text.TextAnalysis.tokenEntropy(df).orderBy("doc_id").collect()
      .map(x => x.getLong(0) -> x).toMap
    def h(i: Long) = r(i).getAs[java.lang.Double]("entropy")
    assert(math.abs(h(1L) - (math.log(3) - 2 * math.log(2) / 3)) < 1e-4)
    assert(math.abs(h(2L) - math.log(4)) < 1e-4)
    assert(r(2L).getAs[java.lang.Double]("entropy_efficiency") == 1.0)
    assert(h(3L) == 0.0 && r(3L).getAs[java.lang.Double]("entropy_efficiency") == 0.0)
    assert(h(4L) == 0.0 && r(4L).getAs[java.lang.Double]("entropy_efficiency") == null)
    assert(r(5L).getAs[Long]("n_tokens") == 0L && h(5L) == null)
  }

  test("t17 readability: hand-computed Flesch/FK; fragments floor at one sentence") {
    val df = Seq(
      (1L, "The cat sat. It ran!"), // 5 words, 2 sentences, 5 vowel runs
      (2L, "no terminator here"))   // 3 words, sentences floor to 1
    .toDF("doc_id", "text")
    val r = text.TextAnalysis.readability(df).orderBy("doc_id").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) == 5L && r(1L).getLong(2) == 2L && r(1L).getLong(3) == 5L)
    assert(math.abs(r(1L).getDouble(4) -
      (206.835 - 1.015 * 2.5 - 84.6 * 1.0)) < 1e-9, s"flesch ${r(1L).getDouble(4)}")
    assert(math.abs(r(1L).getDouble(5) -
      (0.39 * 2.5 + 11.8 * 1.0 - 15.59)) < 1e-9, s"fk ${r(1L).getDouble(5)}")
    assert(r(2L).getLong(2) == 1L, "sentence count must floor at 1")
  }

  test("t18 code detect: code-shaped doc fires, prose doesn't, line count exact") {
    val df = Seq(
      (1L, "int main() { return 0; }\n\tx = y;\n\tz();"),
      (2L, "just plain words of ordinary prose with no symbols at all"))
      .toDF("doc_id", "text")
    val r = text.TextAnalysis.codeDetect(df).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 3L, s"3 lines: ${r(0)}")
    assert(r(0).getBoolean(5), "brace/semicolon density must flag code")
    assert(!r(1).getBoolean(5), "prose must pass")
    assert(r(1).getDouble(2) == 0.0 && r(1).getDouble(3) == 0.0)
  }

  test("LM surprisal: hand-computed unigram negative log-likelihoods") {
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // counts: a=2 b=2 c=1, total=5 → nll(a)=nll(b)=ln(2.5), nll(c)=ln(5)
    val r = text.TextAnalysis.lmSurprisal(df).orderBy("doc_id").collect()
    assert(r(0).getLong(0) == 1L && r(0).getLong(2) == 3L)
    assert(math.abs(r(0).getDouble(1) - math.log(2.5)) < 5e-5)
    assert(r(1).getLong(2) == 2L)
    assert(math.abs(r(1).getDouble(1) - (math.log(2.5) + math.log(5.0)) / 2) < 5e-5)
  }

  test("fingerprint is order-insensitive, content-sensitive") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma alpha beta"),
      (3L, "alpha beta delta")).toDF("doc_id", "text")
    val fp = text.TextAnalysis.fingerprint(df).select("doc_id", "fingerprint")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("quality score features computed correctly on a known doc") {
    val df = Seq((1L, "the cat sat.")).toDF("doc_id", "text")
    val r = text.TextAnalysis.qualityScore(df).head()
    assert(r.getAs[Long]("len_chars") == 12L)
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Double]("punct_ratio") == math.rint(1.0 / 12 * 1e6) / 1e6)
    assert(r.getAs[Double]("stopword_ratio") == math.rint(1.0 / 3 * 1e6) / 1e6)
  }

  test("token counts: bpe-ish >= whitespace tokens") {
    val r = text.TextAnalysis.t2Tokens(spark, sf)
    assert(r.filter(col("bpe_ish_tokens") < col("ws_tokens")).count() == 0)
  }

  test("langId picks profile argmax and falls back to und") {
    val df = Seq(
      (1L, "der hund und die katze ist da"),
      (2L, "xyzzy qwerty")).toDF("doc_id", "text")
    val got = text.TextAnalysis.langId(df).select("doc_id", "lang_pred")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "de")
    assert(got(2L) == "und")
  }

  test("t8: sorted-run fold counts types and hapaxes like a frequency table") {
    val df = Seq(
      (1L, "a b a c b a"),   // counts a:3 b:2 c:1 -> types 3, hapax 1
      (2L, "x x x"),          // types 1, hapax 0
      (3L, "one two three"),  // all hapax
      (4L, ""),               // empty -> zeros, null ratios
      (5L, "  padded   spacing  ")) // ws runs collapse, 2 tokens
      .toDF("doc_id", "text")
    val got = text.TextAnalysis.typeTokenStats(df)
      .select("doc_id", "n_tokens", "n_types", "hapax")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((6L, 3L, 1L)))
    assert(got(2L) == ((3L, 1L, 0L)))
    assert(got(3L) == ((3L, 3L, 3L)))
    assert(got(4L) == ((0L, 0L, 0L)))
    assert(got(5L) == ((2L, 2L, 2L)))
    val ratios = text.TextAnalysis.typeTokenStats(df)
      .filter(col("doc_id") === 4L).select("ttr", "hapax_frac").head()
    assert(ratios.isNullAt(0) && ratios.isNullAt(1), "empty doc ratios are null, not 0/0")
  }

  test("t11: per-source KL matches the hand computation; drifted source ranks above conforming") {
    import spark.implicits._
    // corpus: x appears 3 times, y once (N=4, q_x=3/4, q_y=1/4)
    // srcA = [x, y]: KL = .5 ln(.5/.75) + .5 ln(.5/.25) = .5 ln(4/3)
    // srcB = [x, x]: KL = ln(1/.75) = ln(4/3)
    val df = Seq(("srcA", "x y"), ("srcB", "x x"))
      .toDF("source", "text").withColumn("doc_id", lit(0L))
    val got = text.TextAnalysis.sourceKlDivergence(df)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val ln43 = math.log(4.0 / 3.0)
    assert(got("srcA") == ((2L, 2L, math.rint(0.5 * ln43 * 1e4) / 1e4)))
    assert(got("srcB") == ((2L, 1L, math.rint(ln43 * 1e4) / 1e4)))
    assert(got("srcB")._3 > got("srcA")._3,
      "the fully-skewed source must show more drift")
    // layout invariance (the agg must not depend on partitioning)
    val re = text.TextAnalysis.sourceKlDivergence(df.repartition(5))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(re == got.map { case (k, v) => k -> v._3 })
  }

  test("t13 zipf: exact power law fits alpha 1, uniform source fits 0") {
    // counts 60/r at consecutive ranks 1..5 — 60,30,20,15,12 — is an
    // EXACT alpha=1 power law with integer counts; uniform counts
    // have zero log-log slope
    val power = (1 to 5).flatMap(r => Seq.fill(60 / r)(s"p$r")).mkString(" ")
    val flat = Seq.fill(4)(Seq("u1", "u2", "u3")).flatten.mkString(" ")
    val docs = Seq((1L, power, "power"), (2L, flat, "flat"))
      .toDF("doc_id", "text", "source")
    val r = text.TextAnalysis.zipfAlpha(docs).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r("power") == ((5L, 1.0)), s"got ${r("power")}")
    assert(r("flat")._1 == 3L && math.abs(r("flat")._2) == 0.0, s"got ${r("flat")}")
  }

  test("t12 novelty: first occurrence owns the shingle, copies score zero, short docs null") {
    val docs = Seq(
      (1L, "a b c d"),     // shingles "a b c","b c d" — both first here
      (2L, "a b c d"),     // exact recycle → novelty 0
      (3L, "b c d e"),     // "b c d" seen, "c d e" new → 0.5
      (4L, "x y"))         // < 3 tokens → no shingles
      .toDF("doc_id", "text")
    val r = text.TextAnalysis.noveltyScores(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) None else Some(x.getDouble(3))))).toMap
    assert(r(1L) == ((2L, 2L, Some(1.0))), s"got ${r(1L)}")
    assert(r(2L) == ((2L, 0L, Some(0.0))), s"got ${r(2L)}")
    assert(r(3L) == ((2L, 1L, Some(0.5))), s"got ${r(3L)}")
    assert(r(4L) == ((0L, 0L, None)), s"got ${r(4L)}")
    // layout invariance on the real corpus
    val real = Tables.documents(spark, sf)
    val base = text.TextAnalysis.noveltyScores(real).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    val again = text.TextAnalysis.noveltyScores(real.repartition(7)).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(base == again, "novel counts must be partitioning-invariant")
  }

  test("t14 vocab coverage: hand-checked ladder, k past the vocab saturates at 1") {
    import spark.implicits._
    // counts: a×3, b×2, c×1 → top-1 = 3/6, top-2 = 5/6, top-10 = 6/6
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = text.TextAnalysis.vocabCoverage(docs, ks = Seq(1, 2, 10)).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    assert(r(1L) == ((1L, 3L, 6L, 0.5)), s"got ${r(1L)}")
    assert(r(2L) == ((2L, 5L, 6L, 0.833333)), s"got ${r(2L)}")
    assert(r(10L) == ((3L, 6L, 6L, 1.0)), s"got ${r(10L)}")
    // real corpus: coverage is monotone in k and ends ≤ 1
    val real = text.TextAnalysis.t14VocabCoverage(spark, sf).collect()
      .map(x => (x.getLong(0), x.getDouble(4))).sortBy(_._1)
    assert(real.sliding(2).forall(p => p(0)._2 <= p(1)._2), "coverage must be monotone")
    assert(real.last._2 <= 1.0)
  }

  test("t15 confusion matrix: mislabeled doc lands off-diagonal, shares sum to 1 per declared") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat and the dog is of to", "en"),   // correct label
      (2L, "the king and the queen of all", "zh"),  // English text declared zh
      (3L, "der hund und die katze ist", "de"))     // correct label
      .toDF("doc_id", "text", "lang")
    val r = text.TextAnalysis.langConfusion(docs).collect()
      .map(x => (x.getString(0), x.getString(1)) -> ((x.getLong(2), x.getDouble(3)))).toMap
    assert(r == Map(
      ("en", "en") -> ((1L, 1.0)),
      ("zh", "en") -> ((1L, 1.0)),
      ("de", "de") -> ((1L, 1.0))), s"got $r")
    // real corpus: per-declared shares form a distribution
    val shares = text.TextAnalysis.t15LangConfusion(spark, sf).collect()
      .map(x => x.getString(0) -> x.getDouble(3))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    shares.foreach { case (d, s) =>
      assert(math.abs(s - 1.0) < 1e-4, s"declared $d shares sum to $s") }
  }

  test("t16 bigram ppl: LM hit vs stupid backoff vs first-token unigram, exact law") {
    import spark.implicits._
    // corpus: "a b" x3 (the top bigram), "a c" once. lmSize=1 keeps
    // ONLY (a,b): doc 4's (a,c) must back off.
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
      .toDF("doc_id", "text")
    val r = text.TextAnalysis.bigramPerplexity(docs, lmSize = 1).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(3)))).toMap
    // counts: a=4, b=3, c=1; T=8, V=3; LM: p(b|a) = 3/4
    val pFirstA = (4.0 + 1) / (8 + 3)            // first-token unigram
    val nllAB = -(math.log(pFirstA) + math.log(3.0 / 4)) / 2
    val pBackC = 0.4 * (1.0 + 1) / (8 + 3)       // (a,c) backoff on c
    val nllAC = -(math.log(pFirstA) + math.log(pBackC)) / 2
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(1L)._1 == 2L && r(1L)._2 == r4(nllAB), s"got ${r(1L)}")
    assert(r(4L)._1 == 2L && r(4L)._2 == r4(nllAC), s"got ${r(4L)}")
    assert(r(1L)._3 == r4(math.exp(r(1L)._2)), "ppl = exp of the rounded avg")
    assert(r(4L)._2 > r(1L)._2, "backoff doc must be more surprising")
    // plan: the trained LM must ride a broadcast into the scoring pass
    val df = text.TextAnalysis.bigramPerplexity(Tables.documents(spark, sf))
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("BroadcastHashJoin"), s"LM must broadcast:\n$plan")
  }

  test("t16 counts frame is duplication-invariant in size, exact in mass") {
    import spark.implicits._
    // round 11: the bigram LM's only persisted frame is (w1, w2, c12)
    // — its ROW SET must be a function of the distinct texts alone
    // (duplication raises counts, never cardinality), the boundedness
    // claim the 100 TB contract rests on
    val base = Seq((1L, "a b c"), (2L, "a c"), (3L, "b b a"))
      .toDF("doc_id", "text")
    val dup = (0 until 5).map(k =>
      base.select((col("doc_id") + lit(k * 100L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    def m(df: org.apache.spark.sql.DataFrame) =
      text.TextAnalysis.bigramCounts(df).collect()
        .map(x => (Option(x.get(0)).map(_.toString).getOrElse("∅"),
          x.getString(1)) -> x.getLong(2)).toMap
    val (b, d) = (m(base), m(dup))
    assert(b.keySet == d.keySet,
      s"x5 duplication changed the counts frame's rows: ${b.keySet} vs ${d.keySet}")
    b.foreach { case (k, c) =>
      assert(d(k) == 5 * c, s"$k: expected ${5 * c}, got ${d(k)}") }
    // and the per-copy scores agree with the base-corpus shape: every
    // copy of a text scores identically (the model sees one corpus)
    val scored = text.TextAnalysis.bigramPerplexity(dup)
      .withColumn("base_id", col("doc_id") % 100)
      .groupBy(col("base_id")).agg(countDistinct(col("ppl")).as("n"))
      .collect()
    assert(scored.forall(_.getLong(1) == 1L),
      "copies of one text must score one ppl")
  }

  test("integer half-away µ-rounding law (t21/x27/x28): property-equal to BigDecimal HALF_UP") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      s <- Gen.chooseNum(-2000000000L, 2000000000L)
      n <- Gen.chooseNum(1L, 5000000L)
    } yield (s, n)
    val prop = Prop.forAll(gen) { case (s, n) =>
      // the law as spelled in the operators: sign-split trunc-div
      val q = (math.abs(s) * 2000 + n) / (2 * n)
      val got = if (s < 0) -q else q
      // reference: exact rational s·1000/n rounded HALF_UP (=
      // half-away-from-zero in java.math) to 0 decimals
      val want = new java.math.BigDecimal(s)
        .multiply(new java.math.BigDecimal(1000))
        .divide(new java.math.BigDecimal(n), 0, java.math.RoundingMode.HALF_UP)
        .longValueExact()
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(20000), prop)
    assert(res.passed, s"µ-rounding law diverged from the reference: ${res.status}")
  }

  test("t21 classifier: integer score law, sigmoid bounds, both labels fire, narrow plan") {
    import spark.implicits._
    val df = text.TextAnalysis.hashedQualityClassifier(Tables.documents(spark, sf))
    val r = df.collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (n, s, lm, p) = (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4))
      assert(n > 0 && math.abs(s) <= 1001 * n, "score bounded by max |milli-weight| per token")
      // integer half-away rounding law replayed in Scala
      val q = (math.abs(s) * 2000 + n) / (2 * n)
      assert(lm == (if (s < 0) -q else q), s"logit_micro law: s=$s n=$n lm=$lm")
      assert(p > 0.0 && p < 1.0 || lm == 0 && p == 0.5)
      assert((x.getString(5) == "keep") == (p >= 0.5))
    }
    assert(r.exists(_.getString(5) == "keep") && r.exists(_.getString(5) == "drop"),
      "the deterministic weight table must split the corpus, not collapse to one label")
    // all-whitespace docs are dropped, scored docs keep their count
    val ws = Seq((1L, "  \t "), (2L, "solid text here")).toDF("doc_id", "text")
    assert(text.TextAnalysis.hashedQualityClassifier(ws).collect().map(_.getLong(0)).toSeq == Seq(2L))
    // scoring is one narrow pass — no exchange anywhere
    val plan = df.queryExecution.optimizedPlan.toString
    val exec = text.TextAnalysis.hashedQualityClassifier(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!exec.contains("Exchange"), s"classifier must stay narrow:\n$exec\n$plan")
  }

  test("t22 keywords: hand-computed tf-idf ranks, everywhere-token scores 0, short docs truncate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the apple apple banana"),
      (2L, "the banana cherry"),
      (3L, "the cherry cherry cherry date"),
      (4L, "the banana")).toDF("doc_id", "text")
    val r = text.TextAnalysis.tfidfKeywords(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getString(2), x.getLong(3), x.getLong(4), x.getDouble(5)))).toMap
    // df: apple 1, banana 3, cherry 2, date 1, the 4 (N = 4)
    assert(r((1L, 1L)) == (("apple", 2L, 1L, 2.7726)), s"${r((1L, 1L))}")
    assert(r((1L, 2L)) == (("banana", 1L, 3L, 0.2877)))
    assert(r((1L, 3L)) == (("the", 1L, 4L, 0.0)),
      "an everywhere-token scores exactly 0 and only fills leftover slots")
    assert(r((2L, 1L)) == (("cherry", 1L, 2L, 0.6931)))
    assert(r((3L, 1L)) == (("cherry", 3L, 2L, 2.0794)))
    assert(r((3L, 2L)) == (("date", 1L, 1L, 1.3863)))
    assert(r((4L, 1L)) == (("banana", 1L, 3L, 0.2877)))
    assert(r((4L, 2L)) == (("the", 1L, 4L, 0.0)))
    assert(!r.contains((4L, 3L)), "a two-token doc emits two rows, never padding")
    assert(r.size == 11)
    // corpus invariants: k rows max per doc, ranks dense from 1,
    // scores non-increasing within a doc
    val c = text.TextAnalysis.t22Keywords(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(5)))
    c.groupBy(_._1).foreach { case (id, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.length <= 3 && sorted.map(_._2).toSeq == (1L to sorted.length),
        s"doc $id ranks must be dense 1..k")
      assert(sorted.sliding(2).forall(w => w.length < 2 || w(0)._3 >= w(1)._3),
        s"doc $id scores must be non-increasing by rank")
    }
  }
}
