package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.queries.TextOps

/** TextOps.substringSpans (q179, ExactSubstr dedup à la Lee et al. 2022):
  * windows whose content occurs ≥2 times corpus-wide mark positions;
  * overlapping/adjacent marks merge into maximal per-doc spans. Checked
  * against an in-test brute force over the same (w, stride) grid.
  */
class SubstringSpansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** doc_id → merged duplicated spans (1-based inclusive) by direct
    * enumeration; only docs with ≥1 span appear. */
  private def bruteSpans(docs: Seq[(Long, String)], w: Int,
      stride: Int): Map[Long, List[(Int, Int)]] =
    bruteSpansAt(docs, w,
      text => 1 to (text.length - w + 1) by stride)

  /** The winnowed-anchor position rule, mirrored off
    * TextOps.winnowedPositions. */
  private def winnowedPos(w: Int, k: Int, thresh: String)(
      text: String): Seq[Int] =
    (1 to (text.length - w + 1)).filter(p =>
      p == 1 || (p > k &&
        md5hex(text.substring(p - 1 - k, p - 1)).take(2) < thresh))

  private def bruteSpansAt(docs: Seq[(Long, String)], w: Int,
      posFn: String => Seq[Int]): Map[Long, List[(Int, Int)]] = {
    val wins = for {
      (id, text) <- docs if text.length >= w
      p <- posFn(text)
    } yield (id, p, text.substring(p - 1, p - 1 + w))
    val occ = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val marked = wins.filter(t => occ(t._3) > 1)
      .map { case (id, p, _) => (id, p, p + w - 1) }
    marked.groupBy(_._1).map { case (id, ws) =>
      val sorted = ws.sortBy(_._2)
      // interval-island merge: break when p > furthest end so far + 1
      id -> sorted.foldLeft(List.empty[(Int, Int)]) {
        case (acc, (_, p, pe)) => acc match {
          case (s, e) :: tail if p <= e + 1 => (s, math.max(e, pe)) :: tail
          case _ => (p, pe) :: acc
        }
      }.reverse
    }
  }

  private def inv(byDoc: Map[Long, List[(Int, Int)]])
      : Map[Long, (Long, Long, Long)] =
    byDoc.map { case (id, spans) =>
      id -> (spans.size.toLong,
        spans.map { case (s, e) => (e - s + 1).toLong }.sum,
        spans.head._1.toLong)
    }

  /** (doc_id → (n_spans, dup_chars, first_span)) — q179's shape. */
  private def brute(docs: Seq[(Long, String)], w: Int,
      stride: Int): Map[Long, (Long, Long, Long)] =
    inv(bruteSpans(docs, w, stride))

  /** q181's shape: the inventory over winnowed anchors. */
  private def bruteWinnowed(docs: Seq[(Long, String)], w: Int, k: Int,
      thresh: String): Map[Long, (Long, Long, Long)] =
    inv(bruteSpansAt(docs, w, winnowedPos(w, k, thresh)))

  /** doc_id → text with every span cut — q180's shape (all docs). */
  private def bruteCut(docs: Seq[(Long, String)], w: Int,
      stride: Int): Map[Long, String] = {
    val spans = bruteSpans(docs, w, stride)
    docs.map { case (id, text) =>
      val keep = spans.getOrElse(id, Nil)
        .foldLeft((new StringBuilder, 1)) { case ((sb, pos), (s, e)) =>
          (sb.append(text.substring(pos - 1, s - 1)), e + 1)
        }
      id -> (keep._1.append(text.substring(keep._2 - 1)).toString)
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], w: Int,
      stride: Int): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    TextOps.substringSpans(docs.toDF("doc_id", "text"), w, stride)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("shared prefix, internal repeat, unique doc — hand-checkable " +
      "corpus at stride 1 matches brute force") {
    // NB: tails/middles must be APERIODIC — a run like "uuuuuuuuuuuu"
    // makes every window inside it identical, so the run itself counts
    // as duplicated content (correctly!) and extends the span
    val q = "QQQQQQQQQQQQ" // 12 — appears twice in doc 3
    val docs = Seq(
      1L -> ("PPPPPPPPPPPPPPPPPPPP" + "0a1b2c3d4e5f"), // shared 20-prefix
      2L -> ("PPPPPPPPPPPPPPPPPPPP" + "6g7h8i9j0k1m"),
      3L -> (q + "r1r2r3r4r5r6r7s" + q), // within-doc repeat
      4L -> "zyxwvutsrq9876543210ZYXWVUTSRQ") // fully unique
    val got = run(docs, w = 10, stride = 1)
    assert(got == brute(docs, 10, 1))
    // the run-based docs are degenerate-friendly: sanity-pin the shape
    assert(got(1L) == ((1L, 20L, 1L))) // one maximal span over the prefix
    assert(got(2L) == ((1L, 20L, 1L)))
    assert(got(3L)._1 == 2L) // both Q occurrences, disjoint spans
    assert(!got.contains(4L)) // nothing duplicated → no row
  }

  test("stride > 1 still finds aligned duplicates and merges window " +
      "chains; short docs are skipped") {
    val shared = "The quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      1L -> (shared + " tail one  xxxxxxxxxxxxxxxxxxx"),
      2L -> (shared + " tail two  yyyyyyyyyyyyyyyyyyy"),
      3L -> "short") // < w: no windows, no crash
    val got = run(docs, w = 30, stride = 10)
    assert(got == brute(docs, 30, 10))
    assert(got(1L)._1 == 1L && got(1L)._3 == 1L)
    assert(!got.contains(3L))
  }

  private def runCut(docs: Seq[(Long, String)], w: Int,
      stride: Int): Map[Long, (String, Long)] = {
    import spark.implicits._
    TextOps.substringCut(docs.toDF("doc_id", "text"), w, stride)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
  }

  test("substringCut removes exactly the marked spans and passes " +
      "span-free docs through") {
    val q = "QQQQQQQQQQQQ"
    val docs = Seq(
      1L -> ("PPPPPPPPPPPPPPPPPPPP" + "0a1b2c3d4e5f"),
      2L -> ("PPPPPPPPPPPPPPPPPPPP" + "6g7h8i9j0k1m"),
      3L -> (q + "r1r2r3r4r5r6r7s" + q), // leading + trailing span
      4L -> "zyxwvutsrq9876543210ZYXWVUTSRQ")
    val got = runCut(docs, w = 10, stride = 1)
    val want = bruteCut(docs, 10, 1)
    assert(got.view.mapValues(_._1).toMap == want)
    // removed_chars is the length delta
    docs.foreach { case (id, text) =>
      assert(got(id)._2 == text.length - want(id).length)
    }
    assert(got(1L)._1 == "0a1b2c3d4e5f") // shared prefix cut
    assert(got(3L)._1 == "r1r2r3r4r5r6r7s") // both Q spans cut
    assert(got(4L)._1 == docs(3)._2) // untouched
  }

  private def runWinnowed(docs: Seq[(Long, String)], w: Int, k: Int,
      thresh: String): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    TextOps.winnowedSpans(docs.toDF("doc_id", "text"), w, k, thresh)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("winnowed anchors find a duplicate at a SHIFTED offset that the " +
      "stride grid misses, and match brute force") {
    val rnd = new scala.util.Random(181)
    def rs(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    // search (deterministic seed) for a fragment with an interior anchor:
    // the anchor rate is ~1/10 per position, so a 70-char fragment
    // usually has one; assert we find such a corpus within a few tries
    val corpus = (1 to 50).iterator.map { _ =>
      val frag = rs(70)
      // doc2 embeds the fragment at offset 7 — NOT a multiple of the
      // stride-10 grid, so q179-style sampling can't align the windows
      Seq(1L -> (frag + rs(25)), 2L -> (rs(7) + frag + rs(25)))
    }.find { docs =>
      val got = bruteWinnowed(docs, 30, 4, "1a")
      got.contains(1L) && got.contains(2L)
    }
    assert(corpus.nonEmpty, "no anchor-bearing fragment in 50 seeds")
    val docs = corpus.get
    assert(runWinnowed(docs, 30, 4, "1a") == bruteWinnowed(docs, 30, 4, "1a"))
    // the stride grid misses at least one side of the same corpus (the
    // offsets differ by 7, coprime to the grid) — the hole q181 closes
    val strided = brute(docs, 30, 10)
    assert(!(strided.contains(1L) && strided.contains(2L)))
  }

  test("winnowed fuzz: random corpora match brute force") {
    val rnd = new scala.util.Random(282)
    for (_ <- 1 to 5) {
      val frag = (1 to 50).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val docs = (0 until 10).map { i =>
        val noise = (1 to 40 + rnd.nextInt(50))
          .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
        val text = if (i % 2 == 0) { // arbitrary (unaligned) offsets
          val off = rnd.nextInt(20)
          noise.take(off) + frag + noise.drop(off)
        } else noise
        i.toLong -> text
      }
      assert(runWinnowed(docs, 20, 4, "28") ==
        bruteWinnowed(docs, 20, 4, "28"))
    }
  }

  test("fuzz: random corpora with planted duplicates match brute force") {
    val rnd = new scala.util.Random(179)
    for (_ <- 1 to 5) {
      val frag = (1 to 40).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val docs = (0 until 12).map { i =>
        val noise = (1 to 30 + rnd.nextInt(60))
          .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
        // every 3rd doc embeds the planted fragment at a stride-aligned
        // offset so stride-5 windows line up across docs
        val text = if (i % 3 == 0) {
          val off = 5 * rnd.nextInt(4)
          noise.take(off) + frag + noise.drop(off)
        } else noise
        i.toLong -> text
      }
      assert(run(docs, w = 15, stride = 5) == brute(docs, 15, 5))
      assert(runCut(docs, w = 15, stride = 5).view.mapValues(_._1).toMap ==
        bruteCut(docs, 15, 5))
    }
  }
}
