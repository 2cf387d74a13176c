package graft

import org.apache.spark.sql.functions._
import graft.llmops.Curation

/** §2.9 curation operators: deterministic sampling, quota mixing,
  * decontamination.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta", "a", 36L),
    (2L, "alpha beta gamma delta epsilon zeta", "a", 36L), // dup of 1
    (3L, "one two three four five six seven", "a", 33L),
    (4L, "completely different words here entirely now", "b", 45L),
    (5L, "another unrelated document body text", "b", 36L),
    (6L, "alpha beta gamma overlap prefix only", "b", 36L))
    .toDF("doc_id", "text", "source", "n_chars")

  test("deterministic sample: same rows every run, rate-shaped, stable") {
    val big = spark.range(10000).toDF("doc_id")
    val a = Curation.deterministicSample(big, "doc_id", 0.3, "s")
      .as[Long].collect().toSet
    val b = Curation.deterministicSample(big.repartition(7), "doc_id", 0.3, "s")
      .as[Long].collect().toSet
    assert(a == b) // layout-independent
    assert(math.abs(a.size / 10000.0 - 0.3) < 0.02) // rate within 2pp
    val other = Curation.deterministicSample(big, "doc_id", 0.3, "salt2")
      .as[Long].collect().toSet
    assert(a != other) // salt changes the kept set
    // nested rates: sample(0.1) is a subset of sample(0.3) w/ same salt
    val small = Curation.deterministicSample(big, "doc_id", 0.1, "s")
      .as[Long].collect().toSet
    assert(small.subsetOf(a))
  }

  test("stratified sample: per-stratum rates, default fallback, nested") {
    import org.apache.spark.sql.functions._
    val big = spark.range(6000)
      .withColumn("lang", element_at(typedLit(Seq("en", "de", "fr")),
        (col("id") % 3).cast("int") + 1))
      .withColumnRenamed("id", "doc_id")
    val out = Curation.stratifiedSample(big, "doc_id", "lang",
      Map("en" -> 0.1, "de" -> 0.9), defaultRate = 0.5, salt = "x")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 2000 per lang; rates within a few points
    assert(math.abs(out("en") / 2000.0 - 0.1) < 0.03)
    assert(math.abs(out("de") / 2000.0 - 0.9) < 0.03)
    assert(math.abs(out("fr") / 2000.0 - 0.5) < 0.03)
    // per-stratum nesting: en kept at 0.1 is a subset of en at 0.9
    import spark.implicits._
    val low = Curation.stratifiedSample(big, "doc_id", "lang",
      Map("en" -> 0.1), 0.0, "x").select("doc_id").as[Long].collect().toSet
    val high = Curation.stratifiedSample(big, "doc_id", "lang",
      Map("en" -> 0.9), 0.0, "x").select("doc_id").as[Long].collect().toSet
    assert(low.subsetOf(high))
  }

  test("group quota: k best per group by order col, id tiebreak") {
    val out = Curation.groupQuota(docs, "source", "n_chars", "doc_id", 2)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    // source a: 1 and 2 (36 chars) beat 3 (33); source b: 4 (45) then
    // tie 5/6 at 36 -> doc_id 5 wins the tiebreak.
    assert(out == Set(("a", 1L), ("a", 2L), ("b", 4L), ("b", 5L)))
  }

  test("sequence packing: concat-and-cut bins match the global prefix sum") {
    val df = Seq((1L, 300L), (2L, 400L), (3L, 500L), (4L, 200L), (5L, 900L))
      .toDF("doc_id", "tok")
    // stream offsets: 0, 300, 700, 1200, 1400; capacity 1000
    val out = Curation.packSequences(df, "doc_id", "tok", capacity = 1000,
      partitions = 3)
      .select("doc_id", "bin", "bin_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 300L), (3L, 0L, 700L),
      (4L, 1L, 200L), (5L, 1L, 400L)))
    // partition count must not change the packing (distributed prefix
    // sum == global running sum)
    val one = Curation.packSequences(df, "doc_id", "tok", 1000, 1)
      .select("doc_id", "bin", "bin_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(one.toSeq == out.toSeq)
  }

  test("budget select: inclusive prefix cut in score order, layout-free") {
    val df = Seq(
      (1L, 900L, 300L), (2L, 800L, 400L), (3L, 700L, 500L),
      (4L, 600L, 200L), (5L, 500L, 100L), (6L, 800L, 250L))
      .toDF("doc_id", "score", "tok")
    // order: 1(300) 2(400) 6(250: score tie with 2, id asc) 3(500) ...
    // cums:  300    700    950     1450 -> budget 1000 keeps 1,2,6
    val out = Curation.budgetSelect(df, "doc_id", "tok", "score", 1000L,
      partitions = 3)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 300L, 2L -> 700L, 6L -> 950L))
    // prefix semantics: doc 5 (100 toks) would fit after the cut but is
    // NOT taken -- the selection is a rank cut, not a knapsack
    assert(!out.contains(5L))
    // partition count does not change the selection
    val one = Curation.budgetSelect(df.repartition(7), "doc_id", "tok",
      "score", 1000L, partitions = 1)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(one == out)
    // zero budget keeps nothing; big budget keeps all with exact total
    assert(Curation.budgetSelect(df, "doc_id", "tok", "score", 0L)
      .count() == 0)
    val all = Curation.budgetSelect(df, "doc_id", "tok", "score", 10000L)
    assert(all.count() == 6 &&
      all.agg(max("cum_tokens")).head().getLong(0) == 1750L)
  }

  test("negative score/id fails fast instead of corrupting the key cut") {
    import spark.implicits._
    val bad = Seq((1L, 100L, 500L), (2L, 100L, -3L))
      .toDF("doc_id", "tok", "score")
    val e = intercept[Throwable] {
      Curation.budgetSelect(bad, "doc_id", "tok", "score", 1000L).count()
    }
    assert(e.getMessage.contains("non-negative"))
    val badId = Seq((-7L, 100L)).toDF("doc_id", "tok")
    val e2 = intercept[Throwable] {
      Curation.shardPlan(badId, "doc_id", "tok", 1000L, epoch = 1).count()
    }
    assert(e2.getMessage.contains("non-negative"))
  }

  test("sample stride: ceiling division keeps the hash filter binding") {
    // floor division gave stride=1 for cap < count < 2*cap, so limit(cap)
    // kept only the smallest ids and skewed the last range.
    assert(Curation.sampleStride(50000L, 100000L) == 1L)
    assert(Curation.sampleStride(100000L, 100000L) == 1L)
    assert(Curation.sampleStride(150000L, 100000L) == 2L)
    assert(Curation.sampleStride(200000L, 100000L) == 2L)
    assert(Curation.sampleStride(200001L, 100000L) == 3L)
    // expected sample size count/stride stays <= cap
    for (c <- Seq(1L, 99999L, 100001L, 150000L, 999999L, 10000000L))
      assert(c / Curation.sampleStride(c, 100000L) <= 100000L)
  }

  test("decontamination: overlapping docs drop, others survive") {
    val bench = docs.where(col("doc_id") === 1)
    val corpus = docs.where(col("doc_id") > 1)
    val hits = Curation.contaminationHits(corpus, bench, "doc_id", "text",
      shingleN = 3, minHits = 1)
      .as[(Long, Long)].collect().toMap
    assert(hits.contains(2L)) // exact dup: all 4 shingles hit
    assert(hits(2L) == 4L)
    assert(hits.contains(6L)) // shares the "alpha beta gamma" shingle
    assert(hits(6L) == 1L)
    assert(!hits.contains(3L) && !hits.contains(4L) && !hits.contains(5L))
    val clean = Curation.decontaminate(corpus, bench, "doc_id", "text",
      shingleN = 3, minHits = 1).select("doc_id").as[Long].collect().toSet
    assert(clean == Set(3L, 4L, 5L))
    // minHits above the overlap keeps the partial-overlap doc
    val lax = Curation.decontaminate(corpus, bench, "doc_id", "text",
      shingleN = 3, minHits = 2).select("doc_id").as[Long].collect().toSet
    assert(lax == Set(3L, 4L, 5L, 6L))
  }

  test("snapshot diff: all four statuses") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val v2 = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "text")
    val out = Curation.snapshotDiff(v1, v2, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("novelty: unique text scores 1.0, duplicated text 0.0") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (3L, "zeta eta theta iota kappa lambda")).toDF("id", "text")
    val out = Curation.noveltyScore(df, "id", "text", shingleN = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) == 0L && out(2L) == 0L) // every shingle shared
    assert(out(3L) == 1000000L) // every shingle unique
  }

  test("repeats: integer copies per group with copy ids") {
    import spark.implicits._
    val df = Seq((1L, "de"), (2L, "en"), (3L, "fr")).toDF("id", "lang")
    val out = Curation.withRepeats(df, "lang",
      Map("de" -> 3, "fr" -> 0), defaultRepeat = 1)
      .select("id", "copy").as[(Long, Int)].collect()
    val byId = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
      .toMap
    assert(byId(1L) == Seq(1, 2, 3))
    assert(byId(2L) == Seq(1))
    assert(!byId.contains(3L)) // zero repeats drops the group
  }

  test("dsir: target-like docs keep, off-target drop, short docs defined") {
    val corpus = Seq(
      (1L, "alpha beta alpha beta alpha beta alpha beta", "en"),
      (2L, "alpha beta alpha beta gamma delta alpha beta", "en"),
      (3L, "alpha beta alpha beta alpha beta gamma alpha", "xx"), // en-like
      (4L, "uno dos tres cuatro cinco seis siete ocho", "xx"),
      (5L, "", "xx")) // no shingles
      .toDF("doc_id", "text", "lang")
    // few buckets relative to corpus mass: with B >> total occurrences
    // the add-one smoothing term dominates every llr (documented bias);
    // real corpora have T, R >> B as the gate does.
    val w = Curation.dsirWeights(corpus,
      corpus.where(col("lang") === "en"), "text",
      shingleN = 2, buckets = 8)
    assert(w.length == 8 && w.map(_.bucket) == (0 until 8))
    // weights are a pure function of the corpora: recompute == identical
    assert(w == Curation.dsirWeights(corpus,
      corpus.where(col("lang") === "en"), "text", 2, 8))
    val got = Curation.dsirScores(corpus, "doc_id", "text", w,
      shingleN = 2, buckets = 8, thresholdMicro = 0L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(5L) == ((0L, 0L, false))) // short doc: defined, not kept
    assert(got(1L)._3 && got(2L)._3) // target-vocab docs keep
    assert(!got(4L)._3) // off-target vocab drops
    // scores order by target-likeness: pure target > mixed > disjoint
    assert(got(1L)._2 > got(3L)._2 && got(3L)._2 > got(4L)._2)
    assert(got(4L)._1 == 7L) // 8 tokens -> 7 bigram occurrences
  }

  test("lm score: fluent docs out-score off-target, bits are exact log2") {
    val corpus = Seq(
      (1L, "alpha beta alpha beta alpha beta alpha beta", "en"),
      (2L, "alpha beta alpha beta gamma delta alpha beta", "en"),
      (3L, "alpha beta alpha beta alpha beta gamma alpha", "xx"), // en-like
      (4L, "uno dos tres cuatro cinco seis siete ocho", "xx"),
      (5L, "solo", "xx")) // 1 token -> no bigrams
      .toDF("doc_id", "text", "lang")
    val got = Curation.lmScores(corpus,
      corpus.where(col("lang") === "en"), "doc_id", "text",
      shingleN = 2, buckets = 64, minMeanDeciBits = 30L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(5L) == ((0L, 0L, false))) // no shingles: defined, not kept
    assert(got(1L)._3 && got(2L)._3) // reference-vocab docs keep
    assert(!got(4L)._3) // off-target vocab drops (all counts 0 -> 1 bit)
    assert(got(4L) == ((7L, 7L, false))) // bitlen(0+1)=1 per bigram
    // mean bits order by target-likeness: pure target > mixed > disjoint
    assert(got(1L)._2 * got(3L)._1 > got(3L)._2 * got(1L)._1)
    assert(got(3L)._2 * got(4L)._1 > got(4L)._2 * got(3L)._1)
    // bit math: "alpha beta" occurs 11x in the en refs ("alpha beta"
    // 4+4 from docs 1,2 ... ) -- spot-check one known bucket count:
    // doc 1 has 7 bigrams, 4x "alpha beta" + 3x "beta alpha"; both
    // counts come only from docs 1-2, so bits in [1, 5] each
    assert(got(1L)._1 == 7L && got(1L)._2 >= 7L && got(1L)._2 <= 35L)
  }

  test("epoch shuffle: reproducible order, epochs differ, no collisions") {
    val big = spark.range(2000).toDF("doc_id")
    def order(epoch: Int) = Curation.withEpochShuffle(big, "doc_id", epoch)
      .orderBy("shuffle_key", "doc_id").select("doc_id")
      .as[Long].collect().toSeq
    val e1 = order(1)
    assert(e1 == order(1)) // same epoch -> same order
    assert(e1 != order(2)) // different epoch -> reshuffled
    assert(e1.toSet == (0L until 2000L).toSet) // a permutation
    assert(e1 != (0L until 2000L).toSeq) // and not the identity
  }

  test("weighted sample: rate tracks the weight, monotone, deterministic") {
    val big = spark.range(10000).toDF("doc_id")
      .withColumn("w", (col("doc_id") % 2) * 800000) // half 0, half 0.8
    val kept = Curation.weightedSample(big, "doc_id", "w", "ws")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.forall(_ % 2 == 1)) // zero-weight rows never kept
    assert(math.abs(kept.size / 5000.0 - 0.8) < 0.03) // ~80% of odd rows
    // layout-independent
    val kept2 = Curation.weightedSample(big.repartition(7), "doc_id", "w",
      "ws").select("doc_id").as[Long].collect().toSet
    assert(kept == kept2)
    // monotone: halving every weight keeps a subset
    val half = Curation.weightedSample(
      big.withColumn("w", col("w") / 2), "doc_id", "w", "ws")
      .select("doc_id").as[Long].collect().toSet
    assert(half.subsetOf(kept))
    // full weight keeps everything
    assert(Curation.weightedSample(
      big.withColumn("w", lit(1000000)), "doc_id", "w", "ws").count() == 10000)
  }

  test("temperature mix: smallest group whole, big groups flattened") {
    import spark.implicits._
    // 40 "en" docs, 10 "mi" docs: rate_en = sqrt(10/40) = 0.5
    val df = ((0 until 40).map(i => (i.toLong, "en")) ++
      (100 until 110).map(i => (i.toLong, "mi"))).toDF("id", "lang")
    val kept = Curation.temperatureMix(df, "id", "lang", "t1")
      .select("id", "lang").as[(Long, String)].collect()
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("mi") == 10) // thr = 10000: kept in full
    assert(byLang("en") > 8 && byLang("en") < 32) // ~20 of 40 expected
    // deterministic: same kept set on re-run
    val again = Curation.temperatureMix(df, "id", "lang", "t1")
      .select("id", "lang").as[(Long, String)].collect()
    assert(kept.map(_._1).toSet == again.map(_._1).toSet)
  }

  test("source stats: counts, dup pressure, exact integer mean quality") {
    val out = Curation.sourceStats(docs, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (aDocs, aToks, aDups, aQm) = out("a")
    assert(aDocs == 3 && aToks == 6 + 6 + 7)
    assert(aDups == 2) // docs 1 and 2 share exact text
    val (bDocs, _, bDups, _) = out("b")
    assert(bDocs == 3 && bDups == 0)
    // mean is an integer div of exact long sums: recompute per-doc
    val qm = graft.llmops.TextAnalysis.withQuality(docs, "text")
      .where(col("source") === "a")
      .select(floor(col("quality_score") * 1000000.0).cast("long"))
      .as[Long].collect()
    assert(aQm == qm.sum / qm.length)
  }

  test("shard plan: pure function of (id, epoch), layout-independent") {
    val big = spark.range(2000).toDF("doc_id")
      .withColumn("n_chars", col("doc_id") % 97 + 10)
    def plan(df: org.apache.spark.sql.DataFrame, epoch: Int) =
      Curation.shardPlan(df, "doc_id", "n_chars", 4096L, epoch,
        partitions = 8)
        .select("doc_id", "shard_id", "shard_offset")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
    val e1 = plan(big, 1)
    // layout-independent: a 7-partition relayout places identically
    assert(plan(big.repartition(7), 1).sameElements(e1))
    // different epoch -> different order -> different placement
    assert(!plan(big, 2).sameElements(e1))
    // every offset is within the shard and shards are dense 0..max
    assert(e1.forall { case (_, _, off) => off >= 0 && off < 4096 })
    val shards = e1.map(_._2).toSet
    assert(shards == (0L to shards.max).toSet)
    // conservation: total chars = sum over shards of within-shard spans
    val total = big.agg(sum("n_chars")).as[Long].head()
    assert(total == e1.map(_._1).map(id => id % 97 + 10).sum)
  }

  test("exactSample: exact count, deterministic, nested in n") {
    import spark.implicits._
    val docs = (0L until 500L).toDF("doc_id")
    val s100 = graft.llmops.Curation.exactSample(docs, "doc_id", 100, "x")
      .collect().map(_.getLong(0)).toSet
    assert(s100.size === 100)
    // deterministic across layouts
    val s100b = graft.llmops.Curation
      .exactSample(docs.repartition(13), "doc_id", 100, "x")
      .collect().map(_.getLong(0)).toSet
    assert(s100b === s100)
    // nested: exact-50 is a subset of exact-100 (same salt)
    val s50 = graft.llmops.Curation.exactSample(docs, "doc_id", 50, "x")
      .collect().map(_.getLong(0)).toSet
    assert(s50.subsetOf(s100) && s50.size === 50)
    // different salt samples differently
    val sy = graft.llmops.Curation.exactSample(docs, "doc_id", 100, "y")
      .collect().map(_.getLong(0)).toSet
    assert(sy !== s100)
  }

  test("hashSplit growth stability: growing the corpus never moves an " +
    "existing row between splits") {
    import spark.implicits._
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val small = (0L until 1000L).toDF("doc_id")
    val a = graft.llmops.Curation.hashSplit(small, "doc_id", "s", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.size === 1000) // every row assigned exactly once
    val big = (0L until 5000L).toDF("doc_id")
    val b = graft.llmops.Curation.hashSplit(big, "doc_id", "s", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    a.foreach { case (id, sp) => assert(b(id) === sp) }
  }
}
