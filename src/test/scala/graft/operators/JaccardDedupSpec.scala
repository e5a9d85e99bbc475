package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the lossless prefix-filter property of [[JaccardDedup.pairs]]:
  * bit-identical output to the naive blocked all-pairs join on a DENSE
  * fixture (tiny closed vocabulary — every doc shares tokens with every
  * other, the regime where a lossy filter would under-report) and a
  * SPARSE fixture (large vocabulary, web-corpus shape — the regime the
  * filter exists for), plus the boilerplate-token case: an every-doc
  * token must not force quadratic candidates NOR change the output. */
class JaccardDedupSpec extends SparkSpec {
  import spark.implicits._

  private def prep(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).as("n_tokens"),
        array_distinct(split(col("text"), " ")).as("toks"))

  private def run(docs: DataFrame, t: Double): (Set[(Long, Long, Double)], Set[(Long, Long, Double)]) = {
    def collect(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    (collect(JaccardDedup.pairs(docs, "doc_id", "toks",
        Seq("lang", "n_tokens"), t)),
      collect(JaccardDedup.pairsNaiveBlocked(docs, "doc_id", "toks",
        Seq("lang", "n_tokens"), t)))
  }

  test("dense fixture: prefix filter matches naive bit-for-bit") {
    // 24-word closed vocabulary, 40 docs of 8 tokens each — most pairs
    // share tokens, many land in the same (lang, n_tokens) block
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 24).map(i => s"w$i")
    val docs = prep((0 until 40).map { i =>
      (i.toLong, if (i % 2 == 0) "en" else "de",
        (0 until 8).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    })
    val (pf, naive) = run(docs, 0.5)
    assert(naive.nonEmpty, "fixture must produce pairs to be meaningful")
    assert(pf == naive, s"prefix=${pf.size} naive=${naive.size}")
  }

  test("sparse fixture: large vocabulary, planted near-dups, exact parity") {
    val rnd = new scala.util.Random(13)
    val base = (0 until 60).map { i =>
      (i.toLong, "en",
        (0 until 12).map(_ => s"tok${rnd.nextInt(5000)}").mkString(" "))
    }
    // planted near-dups: copy a doc and perturb one token — same token
    // COUNT so they stay in the same block
    val dups = Seq(100L -> 0, 101L -> 5, 102L -> 9).map { case (id, src) =>
      val words = base(src)._3.split(" ")
      words(words.length - 1) = "perturbed"
      (id, "en", words.mkString(" "))
    }
    val (pf, naive) = run(prep(base ++ dups), 0.5)
    assert(naive.nonEmpty)
    assert(pf == naive, s"prefix=${pf.size} naive=${naive.size}")
  }

  test("every-doc boilerplate token: parity holds and it never enters a prefix") {
    // the hot-key case the blocked join dies on: one token in EVERY doc.
    // With rarest-first ranking it sorts last and (for these sizes)
    // stays out of every prefix — candidates stay bounded by the rare
    // tokens, and the output still matches naive exactly.
    val rnd = new scala.util.Random(99)
    val docs = prep((0 until 50).map { i =>
      (i.toLong, "en",
        ("BOILER " + (0 until 9).map(_ => s"u${i}_${rnd.nextInt(100)}")
          .mkString(" ")))
    } ++ Seq((200L, "en", "BOILER a b c d e f g h i"),
      (201L, "en", "BOILER a b c d e f g h j")))
    val (pf, naive) = run(docs, 0.5)
    assert(naive.contains((200L, 201L, 0.818182)) ||
      naive.exists(p => p._1 == 200L && p._2 == 201L),
      s"planted pair missing from naive: $naive")
    assert(pf == naive, s"prefix=${pf.size} naive=${naive.size}")
  }

  test("block columns prune: identical docs in different blocks never pair") {
    val docs = prep(Seq(
      (1L, "en", "a b c d"),
      (2L, "de", "a b c d"),           // different lang — no pair
      (3L, "en", "a b c d"),           // same block as 1 — pairs
      (4L, "en", "a b c d e")))        // different n_tokens — no pair
    val (pf, naive) = run(docs, 0.5)
    assert(pf == Set((1L, 3L, 1.0)))
    assert(pf == naive)
  }

  test("pairsAuto: both dispatch regimes produce the naive output") {
    val rnd = new scala.util.Random(41)
    // small corpus (sum width^2 well under the cutover) -> naive arm
    val small = prep((0 until 30).map { i =>
      (i.toLong, "en", (0 until 6).map(_ => s"s${rnd.nextInt(40)}").mkString(" "))
    })
    // one 1100-doc block -> sum width^2 = 1.21e6 > 1e6 -> prefix arm
    val wide = prep((0 until 1100).map { i =>
      (i.toLong, "en", (0 until 6).map(_ => s"w${rnd.nextInt(900)}").mkString(" "))
    })
    def s(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    for (docs <- Seq(small, wide)) {
      val auto = s(JaccardDedup.pairsAuto(docs, "doc_id", "toks",
        Seq("lang", "n_tokens"), 0.5))
      val naive = s(JaccardDedup.pairsNaiveBlocked(docs, "doc_id", "toks",
        Seq("lang", "n_tokens"), 0.5))
      assert(auto == naive, s"auto=${auto.size} naive=${naive.size}")
    }
  }

  test("threshold edge: pairs exactly at the 6-dp rounded boundary survive") {
    // jaccard = 4/8 = 0.5 exactly — must be kept by BOTH paths (>= t)
    val docs = prep(Seq(
      (1L, "en", "a b c d x y"),
      (2L, "en", "a b c d p q")))
    val (pf, naive) = run(docs, 0.5)
    assert(naive == Set((1L, 2L, 0.5)))
    assert(pf == naive)
  }
}
