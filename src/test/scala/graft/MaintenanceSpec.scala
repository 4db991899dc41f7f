package graft

import org.apache.spark.sql.functions._

import graft.store.{Maintenance, MaintenanceRule}

/** The auto-maintenance policy op: every default rule fires at/over
  * its threshold, healthy signals emit nothing, severity ranks the
  * plan, and the signal extractors normalize each health report shape
  * correctly. The full composed path over real stores is the
  * oracle-verified `index_maintenance_plan` query. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def sig(rows: (String, String, String, Double)*) =
    rows.toSeq.toDF("index_kind", "index_name", "signal", "value")

  test("every default rule fires exactly at its threshold") {
    for (r <- Maintenance.DefaultRules) {
      val out = Maintenance.plan(
        sig((r.indexKind, "idx", r.signal, r.threshold))).collect()
      assert(out.length == 1, s"rule $r must fire at threshold: ${out.toSeq}")
      assert(out.head.getAs[String]("action") == r.action)
      assert(out.head.getAs[Double]("severity") == 1.0)
      val under = Maintenance.plan(
        sig((r.indexKind, "idx", r.signal, r.threshold * 0.999))).collect()
      assert(under.isEmpty, s"rule $r must NOT fire under threshold")
    }
  }

  test("severity ranks the plan; unknown signals and kinds are ignored") {
    val out = Maintenance.plan(sig(
      ("bm25", "a", "tombstone_ratio", 0.2),  // severity 2.0
      ("graph", "b", "edge_debt", 9.0),       // severity 4.5
      ("ivf", "c", "assignment_drift", 0.02), // severity 2.0 (tie w/ bm25)
      ("ivf", "c", "made_up_signal", 99.0),   // no rule -> no row
      ("hnsw", "d", "edge_debt", 99.0)        // no such kind -> no row
    )).collect()
    assert(out.map(_.getAs[String]("index_name")).toSeq == Seq("b", "a", "c"),
      out.toSeq.toString) // tie at 2.0 broken by index_kind asc: bm25 < ivf
    assert(out.map(_.getAs[Long]("priority")).toSeq == Seq(1L, 2L, 3L))
  }

  test("healthy signals produce the empty plan") {
    assert(Maintenance.plan(sig(
      ("ivf", "a", "assignment_drift", 0.0),
      ("bm25", "b", "bucket_skew", 1.1),
      ("graph", "c", "edge_debt", 1.0))).isEmpty)
  }

  test("extractors: drift reports split into one-sided zero-floored signals") {
    val pos = Seq((0.30, 0.27, 0.03)).toDF(
      "build_mean_sim", "current_mean_sim", "drift")
    val vals = Maintenance.ivfSignals(pos, "i").collect()
      .map(r => r.getAs[String]("signal") -> r.getAs[Double]("value")).toMap
    assert(vals == Map("assignment_drift" -> 0.03, "baseline_stale" -> 0.0))
    val neg = Seq((0.30, 0.34, -0.04)).toDF(
      "build_mean_sim", "current_mean_sim", "drift")
    val nvals = Maintenance.ivfSignals(neg, "i").collect()
      .map(r => r.getAs[String]("signal") -> r.getAs[Double]("value")).toMap
    assert(nvals == Map("assignment_drift" -> 0.0, "baseline_stale" -> 0.04))
    val pq = Seq((0.10, 0.13, 0.03)).toDF(
      "build_mean_err", "current_mean_err", "drift")
    val pv = Maintenance.pqSignals(pq, "p").collect()
    assert(pv.length == 1 && pv.head.getAs[Double]("value") == 0.03)
  }

  test("extractors: bm25 + graph health reports normalize to ratios") {
    val bh = Seq((500L, 12.5, 3000L, 9000L, 40L, "the", 100L, 4.2)).toDF(
      "n_docs", "avg_dl", "n_terms", "n_postings", "max_df", "top_term",
      "n_tombstones", "bucket_skew")
    val bv = Maintenance.bm25Signals(bh, "b").collect()
      .map(r => r.getAs[String]("signal") -> r.getAs[Double]("value")).toMap
    assert(bv == Map("tombstone_ratio" -> 0.2, "bucket_skew" -> 4.2))
    val gh = Seq((510L, 12590L, 510L, 519L, 17L)).toDF(
      "n_nodes", "n_edge_rows", "n_src", "max_rows_per_src", "tombstone_debt")
    val gv = Maintenance.graphSignals(gh, 5, "g").collect()
      .map(r => r.getAs[String]("signal") -> r.getAs[Double]("value")).toMap
    assert(gv("edge_debt") == 4.937255 && gv("tombstone_ratio") == 0.033333)
  }

  test("extractors: sq8 drift+health and lsh health normalize to signals") {
    val drift = Seq((0.30, 0.27, 0.03)).toDF(
      "build_mean_sim", "current_mean_sim", "drift")
    val health = Seq((800L, 120L)).toDF("n_rows", "n_tombstones")
    val sv = Maintenance.sqSignals(drift, health, "s").collect()
      .map(r => r.getAs[String]("signal") -> r.getAs[Double]("value")).toMap
    assert(sv == Map("assignment_drift" -> 0.03, "baseline_stale" -> 0.0,
      "tombstone_ratio" -> 0.15), sv.toString)
    assert(Maintenance.sqSignals(drift, health, "s").collect()
      .forall(_.getAs[String]("index_kind") == "sq8"))
    val lh = Seq((900L, 90L, 16L, 48L)).toDF(
      "n_rows", "n_tombstones", "n_buckets", "n_files")
    val lv = Maintenance.lshSignals(lh, "l").collect()
      .map(r => r.getAs[String]("signal") -> r.getAs[Double]("value")).toMap
    // deliberately exactly TWO signals: planes are stateless literals,
    // no drift signal exists for LSH by construction
    assert(lv == Map("tombstone_ratio" -> 0.1, "file_debt" -> 3.0), lv.toString)
    val lay = Seq((8L, 700L, 88L, 63L, 25L)).toDF(
      "sample_every", "n_nodes", "n_due", "n_in_layer", "n_missing")
    val layv = Maintenance.layerSignals(lay, "g").collect()
    assert(layv.length == 1 && layv.head.getAs[String]("index_kind") == "graph"
      && layv.head.getAs[Double]("value") == 0.284091, layv.toSeq.toString)
    // an empty sample is covered, not broken: no due nodes -> 0.0
    val empty = Seq((8L, 0L, 0L, 0L, 0L)).toDF(
      "sample_every", "n_nodes", "n_due", "n_in_layer", "n_missing")
    assert(Maintenance.layerSignals(empty, "g").head()
      .getAs[Double]("value") == 0.0)
  }

  test("orderBookOf: persistence counts, latest-by-batch values, severity ranking") {
    val log = Seq(
      ("ivf", "a", "retrain", "assignment_drift", 0.02, 0.01, 2.0, 0L),
      ("ivf", "a", "retrain", "assignment_drift", 0.05, 0.01, 5.0, 2L),
      ("bm25", "b", "compact", "tombstone_ratio", 0.30, 0.10, 3.0, 1L)
    ).toDF("index_kind", "index_name", "action", "signal", "value",
      "threshold", "severity", "batch_id")
    val rows = Maintenance.orderBookOf(log).collect()
    assert(rows.length == 2)
    // ranked by the LATEST severity (5.0 beats 3.0), not the firing count
    assert(rows(0).getAs[String]("index_name") == "a", rows.toSeq.toString)
    assert(rows(0).getAs[Long]("first_batch") == 0L &&
      rows(0).getAs[Long]("last_batch") == 2L &&
      rows(0).getAs[Long]("n_fired") == 2L)
    assert(rows(0).getAs[Double]("last_value") == 0.05 &&
      rows(0).getAs[Double]("last_severity") == 5.0,
      "the book must carry the LATEST observation, not the first")
    assert(rows(1).getAs[String]("index_name") == "b" &&
      rows(1).getAs[Long]("n_fired") == 1L)
  }

  test("rules must carry positive thresholds") {
    intercept[IllegalArgumentException] {
      Maintenance.plan(sig(("ivf", "a", "assignment_drift", 1.0)),
        Seq(MaintenanceRule("ivf", "assignment_drift", 0.0, "retrain")))
    }
  }

  test("skewTargetBuckets: floor division, min 1, heavy-term dominance rationale") {
    // the index_maintenance_applied fixture numbers: 11695 postings,
    // max_df 402 -> 14 buckets (expected mass 835 dominates the 402
    // floor; 64 buckets put the expectation UNDER the floor -> 4.3x)
    assert(Maintenance.skewTargetBuckets(11695L, 402L) == 14)
    assert(Maintenance.skewTargetBuckets(10L, 400L) == 1, "never below 1")
    intercept[IllegalArgumentException] {
      Maintenance.skewTargetBuckets(100L, 0L)
    }
  }

  test("orderBookDrain: one dispatch per distinct action in severity order; resolutions acknowledge; openOrders closes, keeps failures, re-opens") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-drain").toString + "/index"
    def logRows(rows: (String, String, String, String, Double, Double, Double, Long)*) =
      rows.toSeq.toDF("index_kind", "index_name", "action", "signal",
        "value", "threshold", "severity", "batch_id")
    // compact fired by TWO signals (dispatch must dedup to one call);
    // retrain carries the higher latest severity (dispatch order)
    logRows(
      ("lsh", "a", "compact", "tombstone_ratio", 0.30, 0.10, 3.0, 0L),
      ("lsh", "a", "compact", "tombstone_ratio", 0.40, 0.10, 4.0, 1L),
      ("lsh", "a", "compact", "file_debt", 6.0, 1.5, 4.0, 1L),
      ("ivf", "b", "retrain", "assignment_drift", 0.09, 0.01, 9.0, 1L))
      .write.parquet(s"$dir.oplog")
    var calls = List.empty[(String, String, String)]
    val rep = Maintenance.orderBookDrain(spark, dir) {
      (k, n, a) => calls :+= ((k, n, a))
    } {
      sig(("lsh", "a", "tombstone_ratio", 0.0), ("lsh", "a", "file_debt", 1.0),
        ("ivf", "b", "assignment_drift", 0.05)) // retrain did NOT clear
    }.collect()
    assert(calls == List(("ivf", "b", "retrain"), ("lsh", "a", "compact")),
      s"severity-ranked, deduped dispatch: $calls")
    val resolved = rep.map(r => r.getAs[String]("signal") ->
      r.getAs[Boolean]("resolved")).toMap
    assert(resolved == Map("tombstone_ratio" -> true, "file_debt" -> true,
      "assignment_drift" -> false), rep.toSeq.toString)
    // acknowledged orders close; the FAILED remedy's order stays open
    val open = Maintenance.openOrders(spark, dir).collect()
    assert(open.map(_.getAs[String]("action")).toSeq == Seq("retrain"),
      open.toSeq.toString)
    // the failed remedy is STALE: zero successful acknowledgments
    assert(open.head.getAs[Long]("n_acks") == 0L, open.head.toString)
    // a post-drain firing re-opens with a fresh batch span — the old
    // acknowledged rows stay closed
    logRows(("lsh", "a", "compact", "tombstone_ratio", 0.50, 0.10, 5.0, 2L))
      .write.mode("append").parquet(s"$dir.oplog")
    val open2 = Maintenance.openOrders(spark, dir).collect()
    assert(open2.length == 2, open2.toSeq.toString)
    val c = open2.find(_.getAs[String]("action") == "compact").get
    assert(c.getAs[Long]("first_batch") == 2L &&
      c.getAs[Long]("n_fired") == 1L, c.toString)
    // ...and the re-opened order is a FLAP, not stale: its remedy
    // resolved once before the signal came back (round-17 item 8)
    assert(c.getAs[Long]("n_acks") == 1L, c.toString)
    assert(open2.find(_.getAs[String]("action") == "retrain").get
      .getAs[Long]("n_acks") == 0L)
    // the resolutions sidecar carries the appended report
    assert(spark.read.parquet(s"$dir.resolutions").count() == 3L)
  }

  test("orderBookDrainCascade: parents dispatch before dependents; the child re-encodes under the FRESH generation; the measured bill acknowledges") {
    import graft.text.Tokenizer
    val docs = graft.io.Tables.documents(spark, sf0001)
    val root = java.nio.file.Files.createTempDirectory("graft-casc").toString
    val tok = s"$root/tok"; val enc = s"$root/enc"; val bk = s"$root/book"
    // a 60-piece budget: tight enough that the retrain's mixture
    // shift displaces pieces gen 0's encode actually used (at 120
    // the union corpus keeps every gen-0 piece and the bill is 0)
    Tokenizer.writeTokenizer(docs, "text", tok, vocabSize = 60)
    Tokenizer.writeEncodedStore(spark, docs.filter(col("doc_id") < 20),
      "text", tok, enc)
    // a fresh encode speaks its own vocabulary exactly
    assert(Tokenizer.encodedStaleness(spark, enc, tok).head()
      .getAs[Double]("stale_ratio") == 0.0)
    // the drift fixture: a mangled copy of the WHOLE corpus — unseen
    // words + an unseen char fire both tokenizer signals, and the
    // mixture shift is large enough that the retrained 120-piece
    // budget genuinely displaces pieces gen 0's encode used (the
    // measured bill below must be > 0); observe so the retrain
    // trains on it
    val mangled = docs
      .select((col("doc_id") + 100000).as("doc_id"),
        translate(col("text"), "e", "#").as("text"))
    Tokenizer.observeBatch(mangled, "text", tok, 0L)
    Maintenance.plan(Maintenance.tokenizerSignals(
        Tokenizer.tokenizerDrift(spark, tok, mangled, "text"), "t"))
      .withColumn("batch_id", lit(0L))
      .write.parquet(s"$bk.oplog")
    val tokD = new Maintenance.TokenizerDrainDispatcher(spark, "t", tok,
      s"$root/tok2")
    val encD = new Maintenance.EncodedDrainDispatcher(spark, "e", enc,
      s"$root/enc2", () => tokD.eff)
    val (disp, after) = Maintenance.defaultDispatch(Seq(tokD, encD))
    var calls = List.empty[(String, String, String)]
    val rep = Maintenance.orderBookDrainCascade(spark, bk,
      Seq(Maintenance.CascadeEdge("tokenizer", "t", "retrain",
        "encoded", "e", "reencode", () => encD.afterSignals))) {
      (k, n, a) => calls :+= ((k, n, a)); disp(k, n, a)
    }(after()).collect()
    // topological order: the parent retrain acted before the child
    assert(calls == List(("tokenizer", "t", "retrain"),
      ("encoded", "e", "reencode")), calls.toString)
    // the child read the FRESH generation: its rewrite speaks the
    // retrained alphabet (the mangled '#' only exists in gen 1)...
    assert(tokD.eff == s"$root/tok2" && encD.eff == s"$root/enc2")
    assert(Tokenizer.encodedStaleness(spark, encD.eff, tokD.eff).head()
      .getAs[Double]("stale_ratio") == 0.0)
    // ...and the cascade row carries the MEASURED post-parent bill
    // (gen 0's encode vs gen 1's vocab — genuinely stale), a derived
    // (never log-fired) order, the parent's batch span, resolved
    val c = rep.find(_.getAs[String]("index_kind") == "encoded").get
    assert(c.getAs[String]("action") == "reencode" &&
      c.getAs[String]("signal") == "encoding_stale")
    assert(c.getAs[Double]("last_value") > 0.01, c.toString)
    assert(c.getAs[Long]("n_fired") == 0L &&
      c.getAs[Long]("first_batch") == 0L &&
      c.getAs[Long]("last_batch") == 0L)
    assert(c.getAs[Double]("value_after") == 0.0 &&
      c.getAs[Boolean]("resolved"), c.toString)
    // both levels acknowledged to the shared sidecar
    assert(spark.read.parquet(s"$bk.resolutions")
      .filter(col("index_kind") === "encoded").count() == 1L)
  }

  test("orderBookDrainCascade: an unfired parent derives no child; a child already in the book dispatches once, not twice") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-casc2").toString + "/book"
    def edge(calls: () => Unit) = Maintenance.CascadeEdge(
      "tokenizer", "t", "retrain", "encoded", "e", "reencode",
      () => { calls(); sig(("encoded", "e", "encoding_stale", 0.5)) })
    // book fires only an UNRELATED order: the edge must stay cold
    Seq(("lsh", "a", "compact", "tombstone_ratio", 0.3, 0.1, 3.0, 0L))
      .toDF("index_kind", "index_name", "action", "signal",
        "value", "threshold", "severity", "batch_id")
      .write.parquet(s"$dir.oplog")
    var calls = List.empty[(String, String, String)]
    var probed = false
    val rep = Maintenance.orderBookDrainCascade(spark, dir,
      Seq(edge(() => probed = true))) {
      (k, n, a) => calls :+= ((k, n, a))
    }(sig(("lsh", "a", "tombstone_ratio", 0.0))).collect()
    assert(calls == List(("lsh", "a", "compact")) && !probed,
      s"$calls probed=$probed")
    assert(rep.forall(_.getAs[String]("index_kind") == "lsh"))
    // book that ALREADY carries the child order: one dispatch, no
    // derived duplicate row
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-casc3").toString + "/book"
    Seq(
      ("tokenizer", "t", "retrain", "oov_rate", 0.5, 0.01, 50.0, 0L),
      ("encoded", "e", "reencode", "encoding_stale", 0.4, 0.01, 40.0, 0L))
      .toDF("index_kind", "index_name", "action", "signal",
        "value", "threshold", "severity", "batch_id")
      .write.parquet(s"$dir2.oplog")
    var calls2 = List.empty[(String, String, String)]
    val rep2 = Maintenance.orderBookDrainCascade(spark, dir2,
      Seq(edge(() => fail("a book-fired child must not re-derive")))) {
      (k, n, a) => calls2 :+= ((k, n, a))
    }(sig(("tokenizer", "t", "oov_rate", 0.0),
        ("encoded", "e", "encoding_stale", 0.0))).collect()
    assert(calls2.count(_ == (("encoded", "e", "reencode"))) == 1, calls2)
    assert(rep2.count(_.getAs[String]("index_kind") == "encoded") == 1)
    // the book-fired child keeps its log-derived n_fired
    assert(rep2.find(_.getAs[String]("index_kind") == "encoded").get
      .getAs[Long]("n_fired") == 1L)
  }

  test("openOrdersDrainCascadeCosted: a parent and its dependents price as ONE admission decision") {
    def mkBook(dir: String): Unit =
      Seq(
        ("tokenizer", "t", "retrain", "oov_rate", 0.5, 0.01, 50.0, 0L),
        ("lsh", "a", "compact", "tombstone_ratio", 0.3, 0.1, 3.0, 0L))
        .toDF("index_kind", "index_name", "action", "signal",
          "value", "threshold", "severity", "batch_id")
        .write.parquet(s"$dir.oplog")
    val costs = Seq(
      ("tokenizer", "t", "retrain", 100L),
      ("lsh", "a", "compact", 50L),
      ("encoded", "e", "reencode", 80L))
      .toDF("index_kind", "index_name", "action", "cost_rows")
    def edge(probed: () => Unit) = Maintenance.CascadeEdge(
      "tokenizer", "t", "retrain", "encoded", "e", "reencode",
      () => { probed(); sig(("encoded", "e", "encoding_stale", 0.5)) })
    val aft = sig(("tokenizer", "t", "oov_rate", 0.0),
      ("lsh", "a", "tombstone_ratio", 0.0),
      ("encoded", "e", "encoding_stale", 0.0))
    // budget 150: the pair charges 100 + 80 = 180 > 150 — the parent
    // defers WITH its dependent (a retrain whose re-encode cannot run
    // would leave a mixed-generation fleet); the cheaper lower-ranked
    // order still uses the window
    val d1 = java.nio.file.Files
      .createTempDirectory("graft-ccw1").toString + "/book"
    mkBook(d1)
    var calls1 = List.empty[(String, String, String)]
    var probed1 = false
    val r1 = Maintenance.openOrdersDrainCascadeCosted(spark, d1, costs,
      150L, Seq(edge(() => probed1 = true))) {
      (k, n, a) => calls1 :+= ((k, n, a))
    }(aft).collect()
    assert(calls1 == List(("lsh", "a", "compact")) && !probed1,
      s"$calls1 probed=$probed1")
    assert(r1.map(_.getAs[String]("index_kind")).toSeq == Seq("lsh"))
    // the deferred pair stays OPEN for the next window
    assert(Maintenance.openOrders(spark, d1).collect()
      .map(_.getAs[String]("index_kind")).toSeq == Seq("tokenizer"))
    // budget 200: the pair (180) admits first by severity and leaves
    // no room for the cheaper order; the child dispatches AFTER the
    // parent with the measured bill and its own cost in the report
    val d2 = java.nio.file.Files
      .createTempDirectory("graft-ccw2").toString + "/book"
    mkBook(d2)
    var calls2 = List.empty[(String, String, String)]
    val r2 = Maintenance.openOrdersDrainCascadeCosted(spark, d2, costs,
      200L, Seq(edge(() => ()))) {
      (k, n, a) => calls2 :+= ((k, n, a))
    }(aft).collect()
    assert(calls2 == List(("tokenizer", "t", "retrain"),
      ("encoded", "e", "reencode")), calls2.toString)
    val c2 = r2.find(_.getAs[String]("index_kind") == "encoded").get
    assert(c2.getAs[Long]("cost_rows") == 80L &&
      c2.getAs[Double]("last_value") == 0.5 &&
      c2.getAs[Boolean]("resolved"), c2.toString)
    assert(!r2.exists(_.getAs[String]("index_kind") == "lsh"))
    // a child that is ALSO an open order CO-ADMITS with its parent
    // (priced once in the parent's 100 + 80 charge — round-20 advice)
    // and never re-derives; at budget 180 the pair fits exactly
    val d3 = java.nio.file.Files
      .createTempDirectory("graft-ccw3").toString + "/book"
    Seq(
      ("tokenizer", "t", "retrain", "oov_rate", 0.5, 0.01, 50.0, 0L),
      ("encoded", "e", "reencode", "encoding_stale", 0.4, 0.01, 40.0, 0L))
      .toDF("index_kind", "index_name", "action", "signal",
        "value", "threshold", "severity", "batch_id")
      .write.parquet(s"$d3.oplog")
    var calls3 = List.empty[(String, String, String)]
    val r3 = Maintenance.openOrdersDrainCascadeCosted(spark, d3, costs,
      180L, Seq(edge(() => fail("a book-fired child must not re-derive")))) {
      (k, n, a) => calls3 :+= ((k, n, a))
    }(aft).collect()
    assert(calls3.count(_ == (("encoded", "e", "reencode"))) == 1, calls3)
    assert(r3.count(_.getAs[String]("index_kind") == "encoded") == 1)
    assert(r3.find(_.getAs[String]("index_kind") == "encoded").get
      .getAs[Long]("n_fired") == 1L)
    // the child dispatches AFTER its parent even as a book order
    assert(calls3 == List(("tokenizer", "t", "retrain"),
      ("encoded", "e", "reencode")), calls3.toString)
  }

  test("openOrdersDrainCascadeCosted: a parent whose OPEN-ORDER child does not fit is not admitted either (round-20 advice)") {
    // parent costs 100, its child's own open order costs 80; budget 120
    // fits the parent ALONE but not the pair. The old admission charged
    // the parent only its own 100 (open children were excluded from the
    // closure), dispatched the retrain, and the child's order then
    // failed its own 100+80 > 120 admission — a retrained vocabulary
    // serving over a stale encoding until some later window. Joint
    // pricing defers the parent; the child may still admit ALONE
    // (re-encoding under the unchanged current generation is
    // consistent).
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ccw4").toString + "/book"
    Seq(
      ("tokenizer", "t", "retrain", "oov_rate", 0.5, 0.01, 50.0, 0L),
      ("encoded", "e", "reencode", "encoding_stale", 0.4, 0.01, 40.0, 0L))
      .toDF("index_kind", "index_name", "action", "signal",
        "value", "threshold", "severity", "batch_id")
      .write.parquet(s"$dir.oplog")
    val costs = Seq(
      ("tokenizer", "t", "retrain", 100L),
      ("encoded", "e", "reencode", 80L))
      .toDF("index_kind", "index_name", "action", "cost_rows")
    val edge = Maintenance.CascadeEdge(
      "tokenizer", "t", "retrain", "encoded", "e", "reencode",
      () => fail("a book-fired child must not re-derive"))
    var calls = List.empty[(String, String, String)]
    val rep = Maintenance.openOrdersDrainCascadeCosted(spark, dir, costs,
      120L, Seq(edge)) {
      (k, n, a) => calls :+= ((k, n, a))
    }(sig(("tokenizer", "t", "oov_rate", 0.0),
        ("encoded", "e", "encoding_stale", 0.0))).collect()
    // no retrain without its re-encode; the child alone still uses the
    // window's remainder
    assert(calls == List(("encoded", "e", "reencode")), calls.toString)
    assert(rep.map(_.getAs[String]("index_kind")).toSeq == Seq("encoded"))
    // the deferred parent stays OPEN for the next window
    assert(Maintenance.openOrders(spark, dir).collect()
      .map(_.getAs[String]("index_kind")).toSeq == Seq("tokenizer"))
  }

  test("cascade child thresholds match per MEASURED SIGNAL, not per first (kind, action) rule (round-20 advice)") {
    // child = a tokenizer store: its one action (retrain) is priced by
    // TWO per-signal rules (fertility_drift 0.2, oov_rate 0.01); the
    // derived book rows must carry each signal's own threshold — the
    // old lookup stamped the first rule's 0.2 on both, mispricing the
    // oov severity 20x
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cthr").toString + "/book"
    Seq(("lsh", "a", "compact", "tombstone_ratio", 0.3, 0.1, 3.0, 0L))
      .toDF("index_kind", "index_name", "action", "signal",
        "value", "threshold", "severity", "batch_id")
      .write.parquet(s"$dir.oplog")
    val edge = Maintenance.CascadeEdge(
      "lsh", "a", "compact", "tokenizer", "t", "retrain",
      () => sig(("tokenizer", "t", "fertility_drift", 0.4),
        ("tokenizer", "t", "oov_rate", 0.4)))
    val rep = Maintenance.orderBookDrainCascade(spark, dir, Seq(edge)) {
      (_, _, _) => ()
    }(sig(("lsh", "a", "tombstone_ratio", 0.0),
        ("tokenizer", "t", "fertility_drift", 0.0),
        ("tokenizer", "t", "oov_rate", 0.0))).collect()
    val bySig = rep.filter(_.getAs[String]("index_kind") == "tokenizer")
      .map(r => r.getAs[String]("signal") ->
        (r.getAs[Double]("threshold"), r.getAs[Double]("last_severity")))
      .toMap
    assert(bySig("fertility_drift") == ((0.2, 2.0)), bySig.toString)
    assert(bySig("oov_rate") == ((0.01, 40.0)), bySig.toString)
  }

  test("cascade drain with NO edges degenerates to orderBookDrain: same dispatches, same report, same acknowledgments") {
    def mkBook(dir: String): Unit =
      Seq(
        ("lsh", "a", "compact", "tombstone_ratio", 0.30, 0.10, 3.0, 0L),
        ("ivf", "b", "retrain", "assignment_drift", 0.09, 0.01, 9.0, 1L))
        .toDF("index_kind", "index_name", "action", "signal",
          "value", "threshold", "severity", "batch_id")
        .write.parquet(s"$dir.oplog")
    val aft = sig(("lsh", "a", "tombstone_ratio", 0.0),
      ("ivf", "b", "assignment_drift", 0.0))
    val d1 = java.nio.file.Files
      .createTempDirectory("graft-deg1").toString + "/book"
    val d2 = java.nio.file.Files
      .createTempDirectory("graft-deg2").toString + "/book"
    mkBook(d1); mkBook(d2)
    var c1 = List.empty[(String, String, String)]
    var c2 = List.empty[(String, String, String)]
    val plain = Maintenance.orderBookDrain(spark, d1) {
      (k, n, a) => c1 :+= ((k, n, a))
    }(aft).collect()
    val casc = Maintenance.orderBookDrainCascade(spark, d2, Nil) {
      (k, n, a) => c2 :+= ((k, n, a))
    }(aft).collect()
    assert(c1 == c2, s"$c1 vs $c2")
    assert(plain.map(_.toSeq).toSeq == casc.map(_.toSeq).toSeq)
    assert(spark.read.parquet(s"$d1.resolutions").collect().map(_.toSeq)
      .sortBy(_.toString).toSeq ==
      spark.read.parquet(s"$d2.resolutions").collect().map(_.toSeq)
        .sortBy(_.toString).toSeq)
  }

  test("cascade chains: grandchildren dispatch in topological levels; the costed charge covers the transitive closure; cycles terminate") {
    val rules = Maintenance.DefaultRules :+
      MaintenanceRule("embedding", "refit_stale", 0.01, "refit")
    // retrain ⇒ reencode ⇒ refit, plus a BACK-EDGE refit ⇒ retrain
    // (the cycle guard: a key never derives twice)
    val edges = Seq(
      Maintenance.CascadeEdge("tokenizer", "t", "retrain",
        "encoded", "e", "reencode",
        () => sig(("encoded", "e", "encoding_stale", 0.5))),
      Maintenance.CascadeEdge("encoded", "e", "reencode",
        "embedding", "m", "refit",
        () => sig(("embedding", "m", "refit_stale", 0.3))),
      Maintenance.CascadeEdge("embedding", "m", "refit",
        "tokenizer", "t", "retrain",
        () => fail("the cycle guard must stop a dispatched key")))
    val aft = sig(("tokenizer", "t", "oov_rate", 0.0),
      ("encoded", "e", "encoding_stale", 0.0),
      ("embedding", "m", "refit_stale", 0.0))
    def mkBook(dir: String): Unit =
      Seq(("tokenizer", "t", "retrain", "oov_rate", 0.5, 0.01, 50.0, 2L))
        .toDF("index_kind", "index_name", "action", "signal",
          "value", "threshold", "severity", "batch_id")
        .write.parquet(s"$dir.oplog")
    val d1 = java.nio.file.Files
      .createTempDirectory("graft-chain1").toString + "/book"
    mkBook(d1)
    var calls = List.empty[(String, String, String)]
    val rep = Maintenance.orderBookDrainCascade(spark, d1, edges, rules) {
      (k, n, a) => calls :+= ((k, n, a))
    }(aft).collect()
    assert(calls == List(("tokenizer", "t", "retrain"),
      ("encoded", "e", "reencode"), ("embedding", "m", "refit")),
      calls.toString)
    // spans propagate down the chain from the root parent's last_batch
    val g = rep.find(_.getAs[String]("index_kind") == "embedding").get
    assert(g.getAs[Long]("first_batch") == 2L &&
      g.getAs[Long]("last_batch") == 2L &&
      g.getAs[Boolean]("resolved"), g.toString)
    // costed: the whole chain (100 + 80 + 40 = 220) is one decision
    val costs = Seq(("tokenizer", "t", "retrain", 100L),
      ("encoded", "e", "reencode", 80L), ("embedding", "m", "refit", 40L))
      .toDF("index_kind", "index_name", "action", "cost_rows")
    val d2 = java.nio.file.Files
      .createTempDirectory("graft-chain2").toString + "/book"
    mkBook(d2)
    var calls2 = List.empty[(String, String, String)]
    val r2 = Maintenance.openOrdersDrainCascadeCosted(spark, d2, costs,
      219L, edges, rules) {
      (k, n, a) => calls2 :+= ((k, n, a))
    }(aft).collect()
    assert(calls2.isEmpty && r2.isEmpty, s"219 < 220 defers the chain: $calls2")
    val d3 = java.nio.file.Files
      .createTempDirectory("graft-chain3").toString + "/book"
    mkBook(d3)
    var calls3 = List.empty[(String, String, String)]
    val r3 = Maintenance.openOrdersDrainCascadeCosted(spark, d3, costs,
      220L, edges, rules) {
      (k, n, a) => calls3 :+= ((k, n, a))
    }(aft).collect()
    assert(calls3 == List(("tokenizer", "t", "retrain"),
      ("encoded", "e", "reencode"), ("embedding", "m", "refit")),
      calls3.toString)
    assert(r3.find(_.getAs[String]("index_kind") == "embedding").get
      .getAs[Long]("cost_rows") == 40L)
  }

  test("fleet planners: the encoded family registers like any store; reencode priced at its corpus row count") {
    import graft.text.Tokenizer
    val docs = graft.io.Tables.documents(spark, sf0001)
    val root = java.nio.file.Files.createTempDirectory("graft-encf").toString
    val tok = s"$root/tok"; val enc = s"$root/enc"
    Tokenizer.writeTokenizer(docs, "text", tok, vocabSize = 60)
    Tokenizer.writeEncodedStore(spark, docs.filter(col("doc_id") < 20),
      "text", tok, enc)
    // against its own generation the store is healthy — no plan row
    assert(graft.store.Maintenance.indexMaintainCosted(spark,
      encoded = Seq(("e", enc, tok))).isEmpty)
    // a retrained serving generation strands the encode → the planner
    // fires reencode, priced at the store's own corpus rows
    Tokenizer.observeBatch(docs
      .select((col("doc_id") + 100000).as("doc_id"),
        translate(col("text"), "e", "#").as("text")), "text", tok, 0L)
    Tokenizer.retrainTokenizer(spark, tok, s"$root/tok2")
    val planned = graft.store.Maintenance.indexMaintainCosted(spark,
      encoded = Seq(("e", enc, s"$root/tok2"))).collect()
    assert(planned.length == 1, planned.toSeq.toString)
    assert(planned.head.getAs[String]("index_kind") == "encoded" &&
      planned.head.getAs[String]("action") == "reencode" &&
      planned.head.getAs[String]("signal") == "encoding_stale")
    assert(planned.head.getAs[Long]("cost_rows") == 20L,
      planned.head.toString)
  }

  test("SqDrainDispatcher: retrain subsumes a later compact; compact-only moves the generation; re_record skipped after retrain") {
    import graft.search.{Ann, Sq}
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val cents = Ann.centroids(emb, "label", "embedding")
      .orderBy(col("key")).collect().map(_.getSeq[Double](1).toSeq).toSeq
    val root = java.nio.file.Files
      .createTempDirectory("graft-dispatch").toString
    // case 1: retrain then compact — the compact must be a no-op (the
    // retrain rebuilt from survivors, tombstone debt included), so the
    // compact path is never created and eff stays at the retrain gen
    Sq.buildIvfSqIndex(emb, cents, s"$root/a")
    Sq.recordIvfSqModel(spark, s"$root/a", cents)
    Sq.deleteFromIvfSqIndex(
      emb.filter(col("vec_id") % 5 === 0).select(col("vec_id")), s"$root/a")
    val d1 = new Maintenance.SqDrainDispatcher(spark, "idx", s"$root/a",
      cents.size, 2, s"$root/a-rt", s"$root/a-cmp")
    d1.dispatch("sq8", "idx", "retrain")
    d1.dispatch("sq8", "idx", "compact")
    d1.dispatch("sq8", "idx", "re_record") // also subsumed: fresh baseline
    assert(d1.eff == s"$root/a-rt")
    assert(!graft.io.Fs.exists(spark, s"$root/a-cmp"),
      "a compact after a retrain must not run")
    // the retrained generation is tombstone-free with a zero baseline
    val sig1 = d1.afterSignals.collect()
      .map(r => r.getAs[String]("signal") -> r.getAs[Double]("value")).toMap
    assert(sig1("assignment_drift") == 0.0 && sig1("tombstone_ratio") == 0.0)
    // rows belonging to OTHER stores are ignored
    d1.dispatch("sq8", "other", "compact")
    d1.dispatch("lsh", "idx", "compact")
    assert(d1.eff == s"$root/a-rt")
    // case 2: compact WITHOUT a retrain runs for real
    Sq.buildIvfSqIndex(emb, cents, s"$root/b")
    Sq.recordIvfSqModel(spark, s"$root/b", cents)
    Sq.deleteFromIvfSqIndex(
      emb.filter(col("vec_id") % 5 === 0).select(col("vec_id")), s"$root/b")
    val d2 = new Maintenance.SqDrainDispatcher(spark, "idx", s"$root/b",
      cents.size, 2, s"$root/b-rt", s"$root/b-cmp")
    d2.dispatch("sq8", "idx", "compact")
    assert(d2.eff == s"$root/b-cmp")
    assert(d2.afterSignals.filter(col("signal") === "tombstone_ratio")
      .head().getAs[Double]("value") == 0.0)
  }

  test("defaultDispatch: every dispatcher sees every order, after = ordered union") {
    var seen = List.empty[(String, String)]
    def sigOf(rows: (String, String, String, Double)*) =
      rows.toSeq.toDF("index_kind", "index_name", "signal", "value")
    def mk(own: String, sg: String) = new Maintenance.DrainDispatcher {
      def eff: String = own
      def dispatch(kind: String, n: String, action: String): Unit =
        if (n == own) seen :+= ((own, action))
      def afterSignals = sigOf(("x", own, sg, 0.0))
    }
    val (dispatch, after) = Maintenance.defaultDispatch(
      Seq(mk("a", "s1"), mk("b", "s2")))
    dispatch("x", "a", "compact")
    dispatch("x", "b", "retrain")
    dispatch("x", "c", "compact") // owned by neither: ignored by both
    assert(seen == List(("a", "compact"), ("b", "retrain")), seen.toString)
    // the after frame unions per-store signals in dispatcher order
    assert(after().collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }

  test("LshDrainDispatcher: compact applies tombstones on a new generation; foreign orders ignored") {
    import graft.search.Ann
    val emb = graft.io.Tables.embeddings(spark, sf0001)
    val planes = Ann.planes(64, 4)
    val root = java.nio.file.Files
      .createTempDirectory("graft-lsh-dispatch").toString
    Ann.buildLshIndex(emb, planes, s"$root/l")
    Ann.deleteFromLshIndex(
      emb.filter(col("vec_id") % 5 === 0).select(col("vec_id")), s"$root/l")
    val d = new Maintenance.LshDrainDispatcher(spark, "emb_lsh", s"$root/l",
      s"$root/l-cmp")
    d.dispatch("sq8", "emb_lsh", "compact") // wrong kind: ignored
    d.dispatch("lsh", "other", "compact")   // wrong store: ignored
    assert(d.eff == s"$root/l")
    d.dispatch("lsh", "emb_lsh", "compact")
    assert(d.eff == s"$root/l-cmp")
    val sigs = d.afterSignals.collect()
      .map(r => r.getAs[String]("signal") -> r.getAs[Double]("value")).toMap
    assert(sigs("tombstone_ratio") == 0.0, sigs.toString)
    assert(sigs("file_debt") == 1.0,
      s"compact leaves one file per bucket: $sigs")
  }

  test("orderBookDrainCosted: greedy severity-order admission, boundary inclusive, skipped orders stay open") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-drain-cost").toString + "/index"
    // three actions by severity: retrain (9) cost 100, compact-b (4)
    // cost 60, compact-c (3, two signals -> cost counted ONCE) cost 50.
    // Budget 150: admit retrain (100), skip compact-b (160 > 150),
    // admit compact-c (150 <= 150 — boundary inclusive).
    Seq(
      ("ivf", "a", "retrain", "assignment_drift", 0.09, 0.01, 9.0, 1L),
      ("bm25", "b", "compact", "tombstone_ratio", 0.40, 0.10, 4.0, 1L),
      ("lsh", "c", "compact", "tombstone_ratio", 0.30, 0.10, 3.0, 0L),
      ("lsh", "c", "compact", "file_debt", 4.5, 1.5, 3.0, 1L)
    ).toDF("index_kind", "index_name", "action", "signal", "value",
      "threshold", "severity", "batch_id")
      .write.parquet(s"$dir.oplog")
    val costs = Seq(("ivf", "a", "retrain", 100L),
      ("bm25", "b", "compact", 60L), ("lsh", "c", "compact", 50L))
      .toDF("index_kind", "index_name", "action", "cost_rows")
    var calls = List.empty[(String, String, String)]
    val rep = Maintenance.orderBookDrainCosted(spark, dir, costs, 150L) {
      (k, n, a) => calls :+= ((k, n, a))
    } {
      sig(("ivf", "a", "assignment_drift", 0.0),
        ("lsh", "c", "tombstone_ratio", 0.0), ("lsh", "c", "file_debt", 1.0))
    }.collect()
    assert(calls == List(("ivf", "a", "retrain"), ("lsh", "c", "compact")),
      s"admitted in severity order, budget-skipped b: $calls")
    // report = admitted rows only (c has two signal rows), all resolved
    assert(rep.length == 3 && rep.forall(_.getAs[Boolean]("resolved")),
      rep.toSeq.toString)
    assert(rep.map(_.getAs[Long]("cost_rows")).toSet == Set(100L, 50L))
    // the skipped order is NOT acknowledged: it is the whole open book
    val open = Maintenance.openOrders(spark, dir).collect()
    assert(open.length == 1 &&
      open.head.getAs[String]("index_name") == "b", open.toSeq.toString)
  }

  test("resolutionReport: resolved per action; a vanished after-signal surfaces as NULL") {
    val planned = Maintenance.plan(sig(
      ("graph", "g", "edge_debt", 5.0),
      ("bm25", "b", "tombstone_ratio", 0.2)))
    val after = sig(
      ("graph", "g", "edge_debt", 1.0)) // bm25 signal MISSING post-act
    val rows = Maintenance.resolutionReport(planned, after)
      .collect().map(r => r.getAs[String]("signal") ->
        ((Option(r.getAs[java.lang.Double]("value_after")),
          Option(r.getAs[java.lang.Boolean]("resolved"))))).toMap
    assert(rows("edge_debt") == ((Some(1.0), Some(true))))
    assert(rows("tombstone_ratio") == ((None, None)),
      "a disappeared signal is a bug and must surface as NULL, not drop")
  }
}
