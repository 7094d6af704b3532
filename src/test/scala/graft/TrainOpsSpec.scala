package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.TrainOps

/** Semantic pins for the training-prep/eval pack (q121–q124) beyond the
  * DuckDB hash gate: shard-order contiguity, recall bounds vs ground
  * truth, BPE merge accounting, and threshold-sweep monotonicity.
  */
class TrainOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("q121: every doc lands in exactly one shard; positions are 0..n-1") {
    val rows = TrainOps.defs("q121_train_order")(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == nDocs)
    assert(rows.map(_.getLong(0)).distinct.length == nDocs)
    rows.foreach(r => assert(r.getInt(1) >= 0 && r.getInt(1) < 64))
    // in-shard positions are a contiguous 0-based run (a writer can
    // stream each shard independently with no gaps)
    rows.groupBy(_.getInt(1)).foreach { case (shard, rs) =>
      val ps = rs.map(_.getLong(2)).sorted
      assert(ps.head == 0L && ps.last == ps.length - 1L, s"shard $shard")
    }
  }

  test("q122: 10 query rows, n_hit in [0,3], recall = n_hit/3") {
    val rows = TrainOps.defs("q122_ann_recall")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val hit = r.getInt(1)
      assert(hit >= 0 && hit <= 3)
      assert(math.abs(r.getDouble(2) - hit / 3.0) < 1e-6)
    }
  }

  test("q123: merges shrink the corpus by at most the pair count, and " +
    "fused pairs vanish from the next round's sequences") {
    val rows = TrainOps.defs("q123_bpe_learn")(spark, sf)
      .orderBy("merge_round").collect()
    assert(rows.length == 3)
    // initial corpus symbol total = total characters of all token instances
    val n0 = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr(
        "aggregate(filter(split(text, ' '), x -> x != ''), 0L, " +
          "(a, x) -> a + length(x)) AS n")
      .agg(sum("n")).collect()(0).getLong(0)
    var prev = n0
    rows.foreach { r =>
      val (c, ns) = (r.getLong(3), r.getLong(4))
      assert(c > 0)
      // greedy one-pass application: overlapping occurrences can't all
      // fuse, so the shrink is positive but bounded by the pair count
      assert(ns < prev && prev - ns <= c,
        s"round ${r.getInt(0)}: $prev -> $ns (pair count $c)")
      prev = ns
    }
  }

  test("q126: encoding accounts for every token; compression in (0,1]") {
    val rows = TrainOps.defs("q126_bpe_encode")(spark, sf).collect()
    val totalToks = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("size(filter(split(text, ' '), x -> x != '')) AS n")
      .agg(sum("n")).collect()(0).getLong(0)
    // the vocab join must not drop a single token instance
    assert(rows.map(_.getInt(1).toLong).sum == totalToks)
    rows.foreach { r =>
      val (nt, nc, nb) = (r.getInt(1), r.getLong(2), r.getLong(3))
      assert(nb <= nc, s"doc ${r.getLong(0)}: merges can only shrink")
      assert(nb >= nt, s"doc ${r.getLong(0)}: every token keeps >=1 symbol")
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0)
    }
  }

  test("q127: kept set matches exact suffix-chain blocklist semantics") {
    val bl = Seq("site3.example.com", "site15.example.com",
      "sub2.site4.example.com")
    def host(id: Long): String =
      if (id % 4 == 0) s"site${id % 20}.example.com"
      else s"sub${id % 7}.site${id % 20}.example.com"
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val expect = ids.filter { id =>
      val h = host(id)
      !bl.exists(e => h == e || h.endsWith("." + e))
    }.toSet
    val got = graft.queries.CurationOps
      .defs("q127_blocklist_filter")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)
    assert(got.size < ids.length, "the blocklist must actually bite")
  }

  test("q124: keep-rate and kept tokens are nonincreasing in the cutoff") {
    val rows = TrainOps.defs("q124_threshold_sweep")(spark, sf)
      .orderBy("threshold").collect()
    assert(rows.length == 9)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getLong(1) >= hi.getLong(1))
      assert(lo.getDouble(2) >= hi.getDouble(2))
      assert(lo.getLong(3) >= hi.getLong(3))
    }
    // the sweep brackets a meaningful operating range: not everything
    // survives the top cutoff, something survives the bottom one
    assert(rows.head.getLong(1) > rows.last.getLong(1))
  }

  test("q141: per-shard offsets are exact prefix sums of token counts " +
    "(concatenate-and-chunk packing leaves no gaps and no overlaps)") {
    val rows = TrainOps.defs("q141_sequence_packing")(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0 && r.getLong(3) < 1024, s"seq_off ${r}")
      assert(r.getLong(2) >= 0)
    }
    // within a shard, reconstruct each doc's start offset
    // (seq_id*1024 + seq_off) and check the sorted run is exactly the
    // running sum of token counts — every token lands in exactly one
    // slot of exactly one sequence
    rows.groupBy(_.getInt(1)).foreach { case (shard, rs) =>
      val byOff = rs.map(r => (r.getLong(2) * 1024L + r.getLong(3),
        r.getLong(4))).sortBy(_._1)
      var expect = 0L
      byOff.foreach { case (off, nTok) =>
        assert(off == expect, s"shard $shard: off $off != $expect")
        expect += nTok
      }
    }
  }

  test("q142 kernel: Viterbi picks the max-score segmentation, ties to " +
    "fewer pieces, singles fall back with the OOV penalty") {
    import graft.functions.UnigramNative
    val vocab = Map[String, Long](
      "a" -> -2000L, "b" -> -2000L, "ab" -> -1000L, "abab" -> -1500L)
    // abab: one 4-char piece (-1500) beats ab+ab (-2000) and chars (-8000)
    assert(UnigramNative.segment("abab", vocab) == (1, -1500L))
    // abab + b: no piece spans the boundary choice — ab ab b? abab+b
    assert(UnigramNative.segment("ababb", vocab) == (2, -3500L))
    // tie: aa as a+a — with "aa" scored equal to a+a, fewer pieces wins
    val tie = vocab + ("aa" -> -4000L)
    assert(UnigramNative.segment("aa", tie) == (1, -4000L))
    // OOV char: penalty single, then known pieces resume
    assert(UnigramNative.segment("zab", vocab) ==
      (2, UnigramNative.Penalty - 1000L))
    // cap: tokens truncate at TokCap before segmentation
    val caps = Map[String, Long]("a" -> -1000L)
    val long = "a" * 40
    val enc = UnigramNative.segment(long.substring(0, UnigramNative.TokCap), caps)
    assert(enc == (UnigramNative.TokCap, -1000L * UnigramNative.TokCap))
  }

  test("q142: per-doc sums are consistent and pieces compress tokens") {
    val rows = TrainOps.defs("q142_unigram_tokenizer")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nPieces, nll) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nTok > 0 && nPieces >= nTok, s"doc ${r.getLong(0)}")
      // every piece costs > 0 milli-nats; NLL grows with piece count
      assert(nll > 0 && nll >= nPieces)
      assert(math.abs(r.getDouble(4) - nPieces.toDouble / nTok) < 1e-6)
    }
  }

  test("q144: fusion equals a plain-Scala RRF over the two gated lists") {
    val dense = graft.queries.VectorOps.defs("q31_ann_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val sparse2 = graft.queries.TextOps.defs("q109_bm25_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    def rrf(k: (Long, Long)): Double = {
      val raw = dense.get(k).map(r => 1.0 / (r + 60.0)).getOrElse(0.0) +
        sparse2.get(k).map(r => 1.0 / (r + 60.0)).getOrElse(0.0)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = (dense.keySet ++ sparse2.keySet).toSeq
      .map(k => (k._1, k._2, rrf(k)))
      .groupBy(_._1).flatMap { case (_, cs) =>
        cs.sortBy(c => (-c._3, c._2)).take(3).zipWithIndex
          .map { case ((q, id, sc), i) => (q, id, i + 1, sc) }
      }.toSet
    val got = TrainOps.defs("q144_hybrid_rrf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(got == expect)
    // docs found by BOTH towers outrank single-tower docs of equal rank
    assert(got.exists { case (q, id, _, sc) =>
      dense.contains((q, id)) && sparse2.contains((q, id)) && sc > 1.0 / 61.0
    }, "fixture should contain at least one both-tower candidate")
  }

  test("q145: splits are domain-pure, exhaustive, and hash-reproducible") {
    val rows = TrainOps.defs("q145_domain_split")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // leakage-freedom: each domain appears in EXACTLY one split
    assert(rows.map(_._1).distinct.length == rows.length)
    // exhaustive: doc counts sum to the corpus
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(rows.map(_._3).sum == docs.count())
    // the assignment is the salted md5 bucket, recomputed independently
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { case (source, split, _, _) =>
      val hex = md.digest(s"${TrainOps.SplitSalt}$source".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val b = java.lang.Long.parseLong(hex.substring(0, 4), 16) % 10
      val want = if (b < 8) "train" else if (b == 8) "val" else "test"
      assert(split == want, s"domain $source")
    }
    // all three splits are populated at this SF (8/1/1 over ~25 domains)
    assert(rows.map(_._2).distinct.toSet == Set("train", "val", "test"))
  }

  test("q199: integer GD learns a separable concept (acc > 0.95) and the " +
    "distributed trajectory equals a single-threaded reference") {
    import spark.implicits._
    // planted signal: y = 1 iff x1 > 500; x2 is noise
    val rows = (0 until 200).map { i =>
      val x1 = if (i % 2 == 0) 100L + (i * 7) % 400 else 600L + (i * 11) % 350
      (if (x1 > 500) 1L else 0L, 1000L, x1, -500L + (i * 13) % 1000)
    }
    val feats = rows.toDF("y", "x0", "x1", "x2").repartition(7)
      .localCheckpoint(true)
    val out = TrainOps.lrTrain(feats, rows.length.toLong).collect()(0)
    val acc = out.getAs[Long]("n_correct").toDouble /
      out.getAs[Long]("n_docs")
    assert(acc > 0.95, s"trained accuracy $acc")

    // single-threaded reference: identical integer trajectory
    val Q = TrainOps.LrQ
    def trunc(a: BigInt, b: BigInt): Long = (a / b).toLong // BigInt / truncates
    var b = Array(0L, 0L, 0L)
    for (_ <- 1 to TrainOps.LrIters) {
      val ss = Array(0L, 0L, 0L)
      rows.foreach { case (y, x0, x1, x2) =>
        val z = trunc(BigInt(b(0)) * x0 + BigInt(b(1)) * x1 +
          BigInt(b(2)) * x2, 1000)
        val p = 500000L + trunc(BigInt(z) * Q, 2L * (Q + math.abs(z)))
        val r = y * Q - p
        ss(0) += r * x0; ss(1) += r * x1; ss(2) += r * x2
      }
      for (j <- 0 to 2)
        b(j) += trunc(BigInt(ss(j)),
          rows.length.toLong * TrainOps.LrStepDiv)
    }
    assert(out.getAs[Long]("b0") == b(0) && out.getAs[Long]("b1") == b(1) &&
      out.getAs[Long]("b2") == b(2))

    // Spark `div` truncates toward zero on negatives (the DuckDB `//`
    // parity every negative residual sum relies on)
    val d = spark.sql("SELECT -7 div 2 AS a, 7 div 2 AS b").collect()(0)
    assert(d.getLong(0) == -3L && d.getLong(1) == 3L)
  }
}
