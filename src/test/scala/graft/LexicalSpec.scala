package graft

import org.apache.spark.sql.functions._

import graft.analysis.Contamination
import graft.search.Lexical
import graft.text.TextAnalysis

/** Lexical retrieval (BM25), hybrid fusion (RRF), PII redaction and
  * benchmark-contamination — key properties on crafted fixtures; the
  * DuckDB oracle covers the full corpus paths. */
class LexicalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: matching docs only, multi-term match outranks one repeated term") {
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "spark spark spark noise"),
      (3L, "spark join"),
      (4L, "plain filler words here")
    ).toDF("doc_id", "text")
    val out = Lexical.bm25TopK(docs, "text", "doc_id", Seq("spark", "join"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(!out.map(_._1).contains(1L) && !out.map(_._1).contains(4L))
    // two distinct terms beat one term saturated by k1 (tf=3 < 2 fresh terms)
    assert(out.head._1 == 3L, out.mkString(","))
    val scores = out.map(_._2)
    assert(scores.sameElements(scores.sorted.reverse))
    // deterministic across runs
    val again = Lexical.bm25TopK(docs, "text", "doc_id", Seq("spark", "join"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(out.sameElements(again))
  }

  test("fuzzy bm25: typos reach vocabulary terms at a distance discount; exact matches keep their score") {
    val docs = Seq(
      (1L, "spark engine runs"),
      (2L, "sparl engine runs"),   // vocab term at dist 1 from "spark"
      (3L, "plain filler words")
    ).toDF("doc_id", "text")
    // exact query: fuzzy with an exact term scores doc 1 exactly like
    // plain bm25 (dist 0 -> boost 1)... and ALSO reaches doc 2 via
    // the dist-1 vocab term "sparl"
    val plain = Lexical.bm25TopK(docs, "text", "doc_id", Seq("spark"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fuzzy = Lexical.bm25FuzzyTopK(docs, "text", "doc_id", Seq("spark"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fuzzy.contains(1L) && fuzzy.contains(2L) && !fuzzy.contains(3L))
    assert(fuzzy(1L) == plain(1L), "exact match must keep its bm25 score")
    assert(fuzzy(2L) < fuzzy(1L), "dist-1 route must score below exact (same tf/dl)")
    // misspelled query: no exact matches anywhere, still retrieves both
    val typo = Lexical.bm25FuzzyTopK(docs, "text", "doc_id", Seq("spariz"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(typo.isEmpty, "dist-2 typos must NOT match at maxDist=1")
    val typo1 = Lexical.bm25FuzzyTopK(docs, "text", "doc_id", Seq("sparc"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(typo1 == Set(1L, 2L), s"dist-1 typo reaches both variants: $typo1")
    // FIRST-character edits are inside the dist-1 match set (the
    // round-13 advice item: plain first-char blocking silently dropped
    // them; the pigeonhole segment keys are lossless at any radius)
    val firstChar = Lexical.bm25FuzzyTopK(docs, "text", "doc_id",
        Seq("park"), 10) // deletion of the leading 's' of "spark"
      .collect().map(_.getLong(0)).toSet
    assert(firstChar == Set(1L), s"first-char edit must match: $firstChar")
    val firstSub = Lexical.bm25FuzzyTopK(docs, "text", "doc_id",
        Seq("tuns"), 10) // first-char substitution of "runs"
      .collect().map(_.getLong(0)).toSet
    assert(firstSub == Set(1L, 2L), s"first-char substitution: $firstSub")
    // single-character vocabulary: the short-string "S:len" key
    // catches the substitution that changes the only character
    val one = Seq((1L, "x y")).toDF("doc_id", "text")
    val oneHit = Lexical.bm25FuzzyTopK(one, "text", "doc_id", Seq("z"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(oneHit == Set(1L), s"len-1 substitution must match: $oneHit")
  }

  test("proximity bm25: adjacent terms outrank the same bag spread apart") {
    val docs = Seq(
      (1L, "spark join now and some other words follow here"),
      (2L, "spark starts here and many words later comes join"),
      (3L, "unrelated filler")
    ).toDF("doc_id", "text")
    val out = Lexical.bm25ProximityTopK(docs, "text", "doc_id",
        Seq("spark", "join"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val byId = out.map(r => r._1 -> r).toMap
    // identical bags -> identical bm25; proximity separates them
    assert(byId(1L)._2 == byId(2L)._2, "same bag must tie on bm25")
    assert(byId(1L)._3 == 0.5, s"adjacent terms: boost 1/(1+1), got ${byId(1L)._3}")
    assert(byId(1L)._3 > byId(2L)._3)
    assert(out.head._1 == 1L, "proximity must break the tie")
    assert(!byId.contains(3L))
  }

  test("phrase match: adjacency required, multi-word fold, repeated occurrences counted") {
    val docs = Seq(
      (1L, "spark join table now"),      // "spark join table" once
      (2L, "spark x join table"),        // broken adjacency
      (3L, "spark join table spark join table"), // twice
      (4L, "table join spark")           // wrong order
    ).toDF("doc_id", "text")
    val two = Lexical.phraseTopK(docs, "text", "doc_id",
        Seq("spark", "join"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == Map(1L -> 1L, 3L -> 2L))
    val three = Lexical.phraseTopK(docs, "text", "doc_id",
        Seq("spark", "join", "table"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(three == Map(1L -> 1L, 3L -> 2L))
  }

  test("spell suggest: nearest wins, frequency breaks distance ties, out-of-range suggests nothing") {
    val docs = Seq(
      (1L, "spark spark spark sparse"),
      (2L, "spark sparse stark")
    ).toDF("doc_id", "text")
    val out = Lexical.spellSuggest(docs, "text", Seq("spariz", "stakr", "qqq"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    // "spariz": spark dist 2 (freq 4) beats sparse dist 2 (freq 2)
    assert(out("spariz") == (("spark", 2L)), out.toString)
    // "stakr": stark is 2 (trailing swap = 2 substitutions); spark is
    // 3 (t, k, r all differ) — distance decides before frequency can
    assert(out("stakr") == (("stark", 2L)), out.toString)
    assert(!out.contains("qqq"))
  }

  test("segment blocking is lossless: 600 random ≤2-edit pairs ALL share a key") {
    // randomized proof of the pigeonhole claim over the shapes that
    // broke earlier schemes: short strings, both-end edits, indel
    // shifts, small alphabet (forced structure collisions). For every
    // generated (word, ≤2-edits word) pair, the INDEX side's segment
    // keys must intersect the PROBE side's shifted-window keys — one
    // miss is one silently unreachable correction.
    val rnd = new scala.util.Random(42)
    val alpha = "abc"
    def word(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def edit(w: String): String = rnd.nextInt(3) match {
      case 0 if w.nonEmpty => // substitute
        val i = rnd.nextInt(w.length)
        w.updated(i, alpha(rnd.nextInt(alpha.length)))
      case 1 => // insert
        val i = rnd.nextInt(w.length + 1)
        w.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + w.substring(i)
      case _ if w.nonEmpty => // delete
        val i = rnd.nextInt(w.length)
        w.substring(0, i) + w.substring(i + 1)
      case _ => w
    }
    val pairs = (1 to 600).map { _ =>
      val base = word(1 + rnd.nextInt(9))
      val edited = (1 to 1 + rnd.nextInt(2)).foldLeft(base)((w, _) => edit(w))
      (base, edited)
    }.filter { case (a, b) => a.nonEmpty && b.nonEmpty }
    // one pass evaluates every vocab term's segment keys
    val segKeys = pairs.map(_._1).distinct.toDF("term")
      .select(col("term"), Lexical.editSegmentKeys(col("term"), 2).as("ks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    val misses = pairs.filter { case (vocabTerm, query) =>
      val probeKeys = Lexical.editProbeKeys(query, 2).toSet
      (segKeys(vocabTerm) intersect probeKeys).isEmpty
    }
    assert(misses.isEmpty,
      s"blocking dropped true ≤2-edit pairs: ${misses.take(10)}")
  }

  test("spell suggest: dist-2 corrections touching BOTH ends are found (round-14 advice)") {
    val docs = Seq((1L, "spark spark")).toDF("doc_id", "text")
    // "tparkx" -> "spark" = sub t->s at the FIRST char + delete the
    // LAST char: both end characters differ, so the retired end-char
    // band keys provably dropped it; the pigeonhole segment keys must
    // keep it (segment "pa" of "spark" survives edit-free in "tparkx")
    val both = Lexical.spellSuggest(docs, "text", Seq("tparkx"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(both("tparkx") == (("spark", 2L)), both.toString)
    // the end-swap shape ("ab" -> "ba" writ large): "kpars" substitutes
    // BOTH the first and last characters of "spark"
    val swap = Lexical.spellSuggest(docs, "text", Seq("kpars"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(swap("kpars") == (("spark", 2L)), swap.toString)
  }

  test("snippets: the window covering the most distinct terms wins, earliest on ties") {
    val docs = Seq(
      (1L, "spark padpad padpad padpad padpad padpad padpad padpad padpad join table spark filler"),
      (2L, "noise noise spark join noise noise noise noise noise noise")
    ).toDF("doc_id", "text")
    val out = Lexical.searchSnippets(docs, "text", "doc_id",
        Seq("spark", "join", "table"), 2, window = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getString(3)))).toMap
    // doc 1: window at "join table spark filler" covers 3 distinct terms
    assert(out(1L) == ((3L, "join table spark filler")), out.toString)
    // doc 2: best = 2 terms starting at its "spark"
    assert(out(2L) == ((2L, "spark join noise noise")), out.toString)
  }

  test("materialized BM25 index ≡ in-memory batch, probe scans only matching buckets") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val qs = Seq(
      (0L, Seq("spark", "join")),
      (1L, Seq("table", "filter")),
      (2L, Seq("spark", "filter", "table"))).toDF("qid", "terms")
    val path = java.nio.file.Files
      .createTempDirectory("graft-bm25-spec").toString + "/index"
    // base + two appends: incremental maintenance must be invisible
    Lexical.buildBm25Index(docs.filter(col("doc_id") % 5 =!= 0), "text", "doc_id", path)
    Lexical.appendToBm25Index(docs.filter(col("doc_id") % 5 === 0 && col("doc_id") < 25),
      "text", "doc_id", path)
    Lexical.appendToBm25Index(docs.filter(col("doc_id") % 5 === 0 && col("doc_id") >= 25),
      "text", "doc_id", path)
    val probe = Lexical.bm25IndexTopKBatch(spark, path, qs, 3)
    // collect probe ITSELF (not a derived orderBy Dataset) so the scan
    // metrics below belong to the plan that actually ran
    val got = probe.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    val mem = Lexical.bm25TopKBatch(docs, "text", "doc_id", qs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    assert(got == mem, s"index probe $got != in-memory batch $mem")
    // the probe must read ONLY the query terms' bucket partitions
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(probe.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("postings")))
      .getOrElse(fail("no parquet scan over the postings found"))
    assert(scan.toString.contains("PartitionFilters"), "pruning must be static (plan-time)")
    val totalFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$path/postings")).count(_.getName.endsWith(".parquet"))
    }
    val numFiles = scan.metrics("numFiles").value
    assert(numFiles > 0 && numFiles < totalFiles,
      s"expected bucket skipping: read $numFiles of $totalFiles files")
  }

  test("BM25 index delete: probe ≡ rebuild on survivors; idempotent; compaction applies") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val qs = Seq(
      (0L, Seq("spark", "join")),
      (1L, Seq("table", "filter"))).toDF("qid", "terms")
    val tmp = java.nio.file.Files.createTempDirectory("graft-bm25-del").toString
    val idx = tmp + "/full"
    Lexical.buildBm25Index(docs, "text", "doc_id", idx)
    // delete 20% + an unknown id; delete one batch TWICE (idempotence)
    val dels = docs.filter(col("doc_id") % 5 === 0).select(col("doc_id"))
    Lexical.deleteFromBm25Index(dels, "doc_id", idx)
    Lexical.deleteFromBm25Index(
      dels.limit(3).unionAll(Seq(999999L).toDF("doc_id")), "doc_id", idx)
    def probe(p: String) = Lexical.bm25IndexTopKBatch(spark, p, qs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    val deleted = probe(idx)
    val survivors = tmp + "/survivors"
    Lexical.buildBm25Index(docs.filter(col("doc_id") % 5 =!= 0), "text", "doc_id", survivors)
    assert(deleted == probe(survivors),
      "tombstoned probe must reproduce a from-scratch build on the survivors")
    assert(deleted.map(_._2).forall(_ % 5 != 0), "no deleted doc may rank")
    // physical compaction: tombstones applied, stats collapsed, same answers
    val compacted = tmp + "/compacted"
    Lexical.compactBm25Index(spark, idx, compacted, "doc_id")
    assert(probe(compacted) == deleted, "compaction must not change probe results")
    assert(!new java.io.File(s"$compacted/tombstones").exists())
    val stats = spark.read.parquet(s"$compacted/stats").collect()
    assert(stats.length == 1 &&
      stats.head.getAs[Long]("n_docs") == docs.filter(col("doc_id") % 5 =!= 0).count())
    // REBUILD at the tombstoned path: stale delete metadata must not
    // leak into the new index — the rebuilt probe sees the full corpus
    Lexical.buildBm25Index(docs, "text", "doc_id", idx)
    val fullIdx = tmp + "/fullref"
    Lexical.buildBm25Index(docs, "text", "doc_id", fullIdx)
    assert(probe(idx) == probe(fullIdx),
      "a fresh build must clear stale tombstones at the path")
  }

  test("BM25 rebucket: probes unchanged, tombstones applied, skew actually drops at the derived count") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val qs = Seq(
      (0L, Seq("spark", "join")),
      (1L, Seq("table", "filter"))).toDF("qid", "terms")
    val tmp = java.nio.file.Files.createTempDirectory("graft-bm25-rb").toString
    val idx = tmp + "/full"
    Lexical.buildBm25Index(docs, "text", "doc_id", idx)
    Lexical.deleteFromBm25Index(
      docs.filter(col("doc_id") % 5 === 0).select(col("doc_id")), "doc_id", idx)
    def probe(p: String) = Lexical.bm25IndexTopKBatch(spark, p, qs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    val before = probe(idx)
    val h = Lexical.bm25IndexHealth(spark, idx).head()
    val nb = graft.store.Maintenance.skewTargetBuckets(
      h.getAs[Long]("n_postings"), h.getAs[Long]("max_df"))
    val rb = tmp + "/rebucketed"
    Lexical.rebucketBm25Index(spark, idx, rb, nb)
    // bucketing moves WHERE postings live, never WHICH docs match
    assert(probe(rb) == before, "rebucket must not change probe results")
    // tombstones applied physically on the way
    assert(!new java.io.File(s"$rb/tombstones").exists())
    val h2 = Lexical.bm25IndexHealth(spark, rb).head()
    assert(h2.getAs[Long]("n_tombstones") == 0L)
    // the point of the remedy: the skew ratio actually resolves (the
    // heaviest term's floor dominates at the OLD count, not the new)
    assert(h2.getAs[Double]("bucket_skew") < h.getAs[Double]("bucket_skew"),
      s"skew must drop: ${h.getAs[Double]("bucket_skew")} -> ${h2.getAs[Double]("bucket_skew")}")
    // layout really changed: the new stats row carries the new count
    val tb = spark.read.parquet(s"$rb/stats").head().getAs[Long]("term_buckets")
    assert(tb == nb.toLong && tb != 64L)
  }

  test("BM25 index append guards: missing stats/ and conflicting bucket layouts fail loudly") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val none = java.nio.file.Files.createTempDirectory("graft-bm25-none").toString
    val e = intercept[IllegalStateException] {
      Lexical.appendToBm25Index(docs.limit(5), "text", "doc_id", none)
    }
    assert(e.getMessage.contains("no stats/"))
    val mixed = java.nio.file.Files
      .createTempDirectory("graft-bm25-mixed").toString + "/index"
    Lexical.buildBm25Index(docs.filter(col("doc_id") < 20), "text", "doc_id", mixed)
    // forge a second stats row with a different bucket layout
    spark.range(1).select(lit(1L).as("n_docs"), lit(100L).as("sum_dl"),
        lit(99L).as("term_buckets"))
      .write.mode("append").parquet(s"$mixed/stats")
    val e2 = intercept[IllegalArgumentException] {
      Lexical.appendToBm25Index(docs.limit(5), "text", "doc_id", mixed)
    }
    assert(e2.getMessage.contains("conflicting term_buckets"))
  }

  test("rm3: feedback expansion surfaces a doc holding none of the original terms") {
    val docs = Seq(
      (1L, "spark shuffle"),
      (2L, "spark partition shuffle"),
      (3L, "shuffle partition tuning"), // no 'spark' — invisible to plain bm25
      (4L, "entirely unrelated words")
    ).toDF("doc_id", "text")
    val plain = Lexical.bm25TopK(docs, "text", "doc_id", Seq("spark"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(plain == Set(1L, 2L), "plain bm25 can only rank matching docs")
    val rm3 = Lexical.rm3TopK(docs, "text", "doc_id", Seq("spark"), 10,
        fbDocs = 2, fbTerms = 3, alpha = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(rm3.contains(3L),
      s"expansion terms from the feedback docs must pull in doc 3, got $rm3")
    assert(!rm3.contains(4L), "a doc matching no weighted term stays out")
  }

  test("pmi expansion recruits the co-occurring term and lifts recall") {
    val docs = Seq(
      (1L, "spark shuffle"),
      (2L, "spark shuffle"),
      (3L, "shuffle tuning notes"), // no 'spark' — invisible to plain bm25
      (4L, "entirely unrelated words"),
      (5L, "spark shuffle")
    ).toDF("doc_id", "text")
    val plain = Lexical.bm25TopK(docs, "text", "doc_id", Seq("spark"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(!plain.contains(3L))
    // 'shuffle' is the only term co-occurring with 'spark' → the
    // associate; its 0.5 weight pulls doc 3 in
    val exp = Lexical.pmiExpandedTopK(docs, "text", "doc_id",
        Seq("spark"), 10, minDf = 1L, expandWeight = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(exp.contains(3L), s"associate must surface doc 3, got $exp")
    assert(!exp.contains(4L), "a doc matching no weighted term stays out")
  }

  test("pmi expansion at weight 0 ranks exactly like plain bm25") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val terms = Seq("spark", "join")
    val plain = Lexical.bm25TopK(docs, "text", "doc_id", terms, 5)
      .collect().map(_.getLong(0)).toSeq
    val exp = Lexical.pmiExpandedTopK(docs, "text", "doc_id", terms, 5,
        minDf = 2L, expandWeight = 0.0)
      .collect().map(_.getLong(0)).toSeq
    assert(exp == plain,
      "zero-weight associates must not perturb the plain ranking")
  }

  test("rm3 at alpha=1 ranks exactly like plain bm25 (scaled scores)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val terms = Seq("spark", "join")
    val plain = Lexical.bm25TopK(docs, "text", "doc_id", terms, 5)
      .collect().map(_.getLong(0)).toSeq
    val rm3 = Lexical.rm3TopK(docs, "text", "doc_id", terms, 5,
        fbDocs = 3, fbTerms = 5, alpha = 1.0)
      .collect().map(_.getLong(0)).toSeq
    assert(rm3 == plain)
  }

  test("index-backed rm3 ≡ in-memory rm3, including across an append") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft-rm3-idx").toString
    val path = s"$tmp/idx"
    Lexical.buildBm25Index(docs.filter(col("doc_id") % 5 =!= 0), "text", "doc_id", path)
    Lexical.appendToBm25Index(docs.filter(col("doc_id") % 5 === 0), "text", "doc_id", path)
    val mem = Lexical.rm3TopK(docs, "text", "doc_id", Seq("spark", "join"), 5,
        fbDocs = 3, fbTerms = 5, alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val idx = Lexical.rm3IndexTopK(spark, path, Seq("spark", "join"), 5,
        fbDocs = 3, fbTerms = 5, alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(idx == mem, s"index $idx vs in-memory $mem")
  }

  test("batch rm3 restricted to one query ≡ single-query index rm3") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft-rm3-batch").toString
    val path = s"$tmp/idx"
    Lexical.buildBm25Index(docs, "text", "doc_id", path)
    val qs = Seq((0L, Seq("spark", "join")), (1L, Seq("table", "filter")))
      .toDF("qid", "terms")
    val batch = Lexical.rm3IndexTopKBatch(spark, path, qs, 5,
        fbDocs = 3, fbTerms = 5, alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap
    for ((qid, terms) <- Seq(0L -> Seq("spark", "join"), 1L -> Seq("table", "filter"))) {
      val single = Lexical.rm3IndexTopK(spark, path, terms, 5,
          fbDocs = 3, fbTerms = 5, alpha = 0.5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      assert(batch(qid) == single, s"qid $qid: batch ${batch(qid)} vs single $single")
    }
  }

  test("rrf: agreement across both rankings beats a single first place") {
    val a = Seq((10L, 0.9), (20L, 0.8), (30L, 0.7)).toDF("id", "sa")
    val b = Seq((10L, 0.95), (40L, 0.85)).toDF("id", "sb")
    val out = Lexical.rrfFuse(a, b, "id", "sa", "sb", 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // 10: 1/61+1/61; 20 and 40: 1/62 each (tie → id asc); 30: 1/63
    assert(out.map(_._1).toSeq == Seq(10L, 20L, 40L, 30L))
    assert(out.head._2 > out(1)._2)
    assert(out(1)._2 == out(2)._2)
  }

  test("linearFuse: min-max blend, degenerate list normalizes to 1, one-sided ids score 0 on that side") {
    val a = Seq((1L, 10.0), (2L, 5.0), (3L, 0.0)).toDF("id", "sa") // norms 1, 0.5, 0
    val b = Seq((2L, 0.3), (4L, 0.3)).toDF("id", "sb")             // max = min → both 1
    val out = Lexical.linearFuse(a, b, "id", "sa", "sb", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.5)   // 0.5·1   + 0.5·0 (absent from b)
    assert(out(2L) == 0.75)  // 0.5·0.5 + 0.5·1
    assert(out(3L) == 0.0)
    assert(out(4L) == 0.5)   // absent from a
    // total order (fused DESC, id ASC) + k truncation: tie at 0.5
    // between ids 1 and 4 → id 1
    val top2 = Lexical.linearFuse(a, b, "id", "sa", "sb", 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top2 == Seq(2L, 1L))
    // alpha weighting: alpha = 1 ignores the b side entirely
    val aOnly = Lexical.linearFuse(a, b, "id", "sa", "sb", 10, alpha = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(aOnly(1L) == 1.0 && aOnly(2L) == 0.5 && aOnly(4L) == 0.0)
  }

  test("linearFuseBatch restricted to one qid ≡ single-query linearFuse") {
    val a = Seq((0L, 1L, 5.0), (0L, 2L, 3.0), (0L, 3L, 1.0),
      (1L, 1L, 9.0), (1L, 4L, 2.0)).toDF("qid", "id", "s")
    val b = Seq((0L, 2L, 0.9), (0L, 5L, 0.7),
      (1L, 4L, 0.5), (1L, 6L, 0.4)).toDF("qid", "id", "v")
    val batch = Lexical.linearFuseBatch(a, b, "id", "s", "v", 10)
      .filter(col("qid") === 0L)
      .select(col("id"), col("fused"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    val single = Lexical.linearFuse(
        a.filter(col("qid") === 0L).select(col("id"), col("s")),
        b.filter(col("qid") === 0L).select(col("id"), col("v")),
        "id", "s", "v", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(batch == single, s"batch $batch vs single $single")
  }

  test("pii redaction replaces emails and phones, leaves clean text alone") {
    val out = Seq(
      (0L, "mail a.b+c@ex-ample.co.uk now or call +1-555-123-4567 ok"),
      (1L, "no pii here @ not-an-email +1-55-1"))
      .toDF("id", "t")
      .select(col("id"), TextAnalysis.redactPii(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "mail [EMAIL] now or call [PHONE] ok")
    assert(out(1L) == "no pii here @ not-an-email +1-55-1")
  }

  test("pii pseudonymization: stable tags preserve linkage, distinct ids differ") {
    val out = Seq(
      (0L, "from a@b.com to c@d.org then a@b.com again"),
      (1L, "reply to a@b.com or call +1-555-123-4567"),
      (2L, "no pii here at all"))
      .toDF("id", "t")
      .select(col("id"), TextAnalysis.pseudonymizePii(col("t")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val tagAB = "\\[EMAIL_\\d+\\]".r.findAllIn(out(0L)).toSeq
    assert(tagAB.length == 3, s"three email sites tagged: ${out(0L)}")
    assert(tagAB(0) == tagAB(2), "the SAME address must carry the SAME tag")
    assert(tagAB(0) != tagAB(1), "distinct addresses must differ")
    // cross-document stability — the linkage property redaction destroys
    val inDoc1 = "\\[EMAIL_\\d+\\]".r.findFirstIn(out(1L)).get
    assert(inDoc1 == tagAB(0), s"a@b.com must tag identically across docs")
    assert(out(1L).contains("[PHONE_"), out(1L))
    assert(out(2L) == "no pii here at all")
  }

  test("fused token_shingle_hashes matches the composed HOF spec, incl. edges") {
    val real = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val edges = Seq((9001L, ""), (9002L, "   "), (9003L, "one"),
      (9004L, "a  b c"), (9005L, "MiXeD Case tokens"))
      .toDF("doc_id", "text")
    for (df <- Seq(real, edges)) {
      val composed = Contamination.gramRowsComposed(df, "text", Seq(col("doc_id")), 3)
      val native = df.select(col("doc_id"),
        explode(graft.functions.TokenShingleHashes(col("text"), 3)).as("gram"))
      val diff = native.exceptAll(composed).count() + composed.exceptAll(native).count()
      assert(diff == 0, s"fused vs composed gram mismatch: $diff rows")
    }
  }

  test("bm25IndexHealth: counts match the corpus, tombstone debt surfaces, compaction clears it") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val path = java.nio.file.Files
      .createTempDirectory("graft-bm25-health").toString + "/index"
    Lexical.buildBm25Index(docs, "text", "doc_id", path)
    val h = Lexical.bm25IndexHealth(spark, path).head()
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("t"))
    assert(h.getAs[Long]("n_docs") == docs.count())
    assert(h.getAs[Long]("n_postings") == toks.distinct().count())
    assert(h.getAs[Long]("n_terms") == toks.select("t").distinct().count())
    assert(h.getAs[Long]("n_tombstones") == 0L)
    assert(h.getAs[Double]("bucket_skew") >= 1.0, "max bucket can't be below the mean")
    val df = toks.distinct().groupBy(col("t")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("t").asc).head()
    assert(h.getAs[Long]("max_df") == df.getLong(1) &&
      h.getAs[String]("top_term") == df.getString(0))
    // logical deletes: debt counted, postings mass unchanged
    Lexical.deleteFromBm25Index(docs.filter(col("doc_id") < 2), "doc_id", path)
    val h2 = Lexical.bm25IndexHealth(spark, path).head()
    assert(h2.getAs[Long]("n_tombstones") == 2L)
    assert(h2.getAs[Long]("n_postings") == h.getAs[Long]("n_postings"))
    // compaction applies them physically: debt 0, docs down, postings down
    val dst = java.nio.file.Files
      .createTempDirectory("graft-bm25-health2").toString + "/index"
    Lexical.compactBm25Index(spark, path, dst, "doc_id")
    val h3 = Lexical.bm25IndexHealth(spark, dst).head()
    assert(h3.getAs[Long]("n_tombstones") == 0L)
    assert(h3.getAs[Long]("n_docs") == docs.count() - 2)
    assert(h3.getAs[Long]("n_postings") < h.getAs[Long]("n_postings"))
  }

  test("contamination flags exactly the docs sharing an n-token shingle") {
    val train = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "zeta eta theta"),
      (3L, "x y alpha beta gamma")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = Contamination.contaminated(train, bench, "text", "doc_id", 3)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L))
  }

  test("bm25Facets: full-match-set counts per facet, best hit by (score, id)") {
    import graft.search.Lexical
    val docs = Seq(
      (1L, "en", "spark join spark"),
      (2L, "en", "join"),
      (3L, "de", "spark"),
      (4L, "de", "nothing relevant here"),
      (5L, "fr", "join join join")).toDF("doc_id", "lang", "text")
    val got = Lexical.bm25Facets(docs, "text", "doc_id", "lang",
        Seq("spark", "join"))
      .orderBy(col("lang")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // matches: en {1, 2}, de {3} (4 matches nothing), fr {5}
    assert(got.map(t => (t._1, t._2)) == Seq(("de", 1L), ("en", 2L), ("fr", 1L)),
      s"got $got")
    // en's best hit is doc 1 (two terms, higher tf)
    assert(got.find(_._1 == "en").get._3 == 1L, s"got $got")
  }
}
