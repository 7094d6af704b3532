package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.PipelineOps

/** Semantic pins for the q82–q89 pipeline pack, independent of the DuckDB
  * oracle: brute-force cross-checks on synthetic corpora and plan-shape
  * assertions on the scale-critical queries. */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("q82: sorted-run fold equals explode-groupBy counting (fuzz)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "dd", "e")
    val docs = (0 until 60).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    df.createOrReplaceTempView("x")
    val got = PipelineOps.defs("q82_repetition")(spark, sf) // plan only
    // run the same plan over the synthetic frame by re-deriving from text
    val out = {
      val toks = filter(split(col("text"), " "), c => c =!= "")
      df.withColumn("toks", toks)
        .select(col("doc_id"), col("toks"))
        .withColumn("top", expr(
          """aggregate(array_sort(toks),
            |  named_struct('prev', '', 'run', CAST(0 AS BIGINT),
            |               'best', CAST(0 AS BIGINT)),
            |  (st, x) -> named_struct('prev', x,
            |    'run', IF(x = st.prev, st.run + 1, CAST(1 AS BIGINT)),
            |    'best', GREATEST(st.best,
            |      IF(x = st.prev, st.run + 1, CAST(1 AS BIGINT)))),
            |  st -> st.best)""".stripMargin))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    }
    val brute = docs.map { case (id, text) =>
      val ts = text.split(" ").filter(_.nonEmpty)
      id -> (if (ts.isEmpty) 0L
             else ts.groupBy(identity).values.map(_.length).max.toLong)
    }.toMap
    assert(out == brute)
    assert(got.columns.toSet == Set("doc_id", "n_tokens", "n_types",
      "top_token_count", "top_bigram_count", "dup_token_frac"))
  }

  test("q82 on testdata: types <= tokens, top counts consistent") {
    val rows = PipelineOps.defs("q82_repetition")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nTyp) = (r.getLong(1), r.getLong(2))
      val (topT, topB) = (r.getLong(3), r.getLong(4))
      assert(nTyp <= nTok && topT >= 1 && topT <= nTok - nTyp + 1)
      assert(topB <= math.max(nTok - 1, 0))
      assert(r.getDouble(5) == (nTok - nTyp).toDouble / nTok)
    }
  }

  test("q84: benchmark side broadcasts; no doc shares a 4-gram with itself") {
    val df = PipelineOps.defs("q84_contamination")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark gram join must broadcast, plan was:\n$plan")
    // src0 docs are excluded from the scored side by construction
    val scored = df.collect().map(_.getLong(0)).toSet
    val benchIds = graft.core.Tables.load(spark, sf, "documents")
      .filter(col("source") === "src0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(scored.intersect(benchIds).isEmpty)
  }

  test("q85: histogram percentile equals sorted-list definition") {
    val got = PipelineOps.defs("q85_length_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select("lang", "n_chars").collect()
      .groupBy(_.getString(0)).map { case (l, rs) =>
        l -> rs.map(_.getLong(1)).sorted
      }
    docs.foreach { case (lang, sorted) =>
      val n = sorted.length
      def disc(p: Double): Long = sorted(math.ceil(p * n).toInt - 1)
      val (nd, p50, p90) = got(lang)
      assert(nd == n.toLong)
      assert(p50 == disc(0.5), s"$lang p50")
      assert(p90 == disc(0.9), s"$lang p90")
    }
  }

  test("q86: rate table broadcasts; max-weight source keeps ~everything") {
    val df = PipelineOps.defs("q86_mix_weighted")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rate join must broadcast, plan was:\n$plan")
    // deterministic: running twice yields identical selections
    val a = df.collect().map(_.getLong(0)).toSet
    val b = PipelineOps.defs("q86_mix_weighted")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("q87: codes bounded by ±127 and max-abs element maps to ±127") {
    val rows = PipelineOps.defs("q87_vec_quantize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cmin, cmax) = (r.getLong(4), r.getLong(5))
      assert(cmin >= -127 && cmax <= 127)
      assert(cmax == 127 || cmin == -127) // the max-abs element hits ±127
    }
  }

  test("q88: per-thread seq is dense from 1 and ordered by (ts, event_id)") {
    val rows = PipelineOps.defs("q88_rac_threads")(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val byThread = rows.groupBy(_._1)
    assert(byThread.keySet == Set(0L, 1L, 2L, 3L))
    byThread.foreach { case (_, rs) =>
      val seqs = rs.map(_._2).sorted
      assert(seqs.head == 1L && seqs.last == seqs.length.toLong)
      assert(seqs.distinct.length == seqs.length)
    }
  }

  test("q89: open + committed = total; resume <= confirmed positions sane") {
    val r = PipelineOps.defs("q89_checkpoint_state")(spark, sf).collect().head
    val (n, nc, no) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n == nc + no && n > 0)
    val (resume, confirmed) = (r.getLong(3), r.getLong(4))
    if (no > 0) assert(resume >= 0) else assert(resume == -1L)
    if (nc > 0) assert(confirmed >= 0)
  }

  test("q90: duplicated 8-token spans found across docs, brute-force pin") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"w$i").mkString(" ") // one shared span
    val docs = Seq(
      (0L, shared + " tail0 a b c"),          // shares span with doc 1
      (1L, "head1 x " + shared),              // shares span with doc 0
      (2L, "only seven tokens live in here now"), // 7 toks → no spans
      (3L, (1 to 20).map(i => s"u$i").mkString(" ")) // unique spans only
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("q90spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = PipelineOps.defs("q90_dup_spans")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // brute force: every 8-token window, distinct per doc, df >= 2
    val texts = Map(0L -> (shared + " tail0 a b c"),
      1L -> ("head1 x " + shared), 2L -> "only seven tokens live in here now",
      3L -> (1 to 20).map(i => s"u$i").mkString(" "))
    val spans = texts.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).sliding(8).filter(_.length == 8)
        .map(_.mkString(" ")).toSet
    }
    val brute = spans.collect { case (id, sp) if sp.nonEmpty =>
      val dup = sp.count(s => spans.count(_._2.contains(s)) >= 2)
      id -> ((sp.size.toLong, dup.toLong, dup.toDouble / sp.size))
    }
    assert(out == brute)
    assert(!out.contains(2L)) // short doc has no spans
    assert(out(0L)._2 >= 1 && out(1L)._2 >= 1) // the shared span is seen
  }

  test("q93: token rarity matches brute-force document frequencies") {
    import spark.implicits._
    val texts = Map(
      0L -> "alpha beta gamma alpha",  // distinct: alpha beta gamma
      1L -> "alpha beta",              // shares alpha, beta
      2L -> "zeta",                    // hapax only
      3L -> "")                        // no tokens → absent from output
    val docs = texts.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("q93spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextOps.defs("q93_token_rarity")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val types = texts.view.mapValues(
      _.split(" ").filter(_.nonEmpty).toSet).toMap
    val dfreq = types.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val brute = types.collect { case (id, ts) if ts.nonEmpty =>
      val sumDf = ts.toSeq.map(dfreq).sum
      val hapax = ts.count(t => dfreq(t) == 1L).toLong
      id -> ((ts.size.toLong, sumDf, hapax, sumDf.toDouble / ts.size))
    }
    assert(out == brute)
    assert(!out.contains(3L))
    assert(out(2L)._3 == 1L) // zeta is a hapax
  }
}
