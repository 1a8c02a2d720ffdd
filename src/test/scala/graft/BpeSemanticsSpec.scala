package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the semantics claim q_text_bpe_encode/train's comment makes
  * about the two-pass chr(31)/chr(30) delimiter replace: EXACT
  * canonical greedy merging for t1 != t2, with the documented
  * deviation window for self-pair merges on long repeated runs.
  * java.lang.String.replace, Spark's StringReplace and DuckDB's
  * replace all share the same contract (literal, left-to-right,
  * non-overlapping, scanning the SOURCE), so the reference here
  * models all three. */
class BpeSemanticsSpec extends AnyFunSuite {
  private val D = "\u001f"
  private val J = "\u001e"

  /** the rows' algebra: join on chr(31), replace twice, split back */
  private def stringMerge(tk: Seq[String], t1: String, t2: String): Seq[String] = {
    if (tk.isEmpty) return tk
    val ts = D + tk.mkString(D) + D
    val p = D + t1 + D + t2 + D
    val r = D + t1 + J + t2 + D
    ts.replace(p, r).replace(p, r).split(D).filter(_.nonEmpty).toSeq
  }

  /** canonical greedy: scan left to right, merge eagerly, resume after
    * the merged token */
  private def greedyMerge(tk: Seq[String], t1: String, t2: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < tk.length) {
      if (i + 1 < tk.length && tk(i) == t1 && tk(i + 1) == t2) {
        out += (t1 + J + t2); i += 2
      } else { out += tk(i); i += 1 }
    }
    out.result()
  }

  private def allSeqs(alphabet: Seq[String], n: Int): Iterator[Seq[String]] =
    if (n == 0) Iterator(Seq.empty)
    else allSeqs(alphabet, n - 1).flatMap(s => alphabet.map(s :+ _))

  test("two-pass replace == canonical greedy for every t1 != t2 sequence (exhaustive, n <= 8)") {
    for (n <- 0 to 8; seq <- allSeqs(Seq("a", "b", "c"), n)) {
      assert(stringMerge(seq, "a", "b") === greedyMerge(seq, "a", "b"),
        s"diverged on $seq")
    }
  }

  test("self-pair merge: sequences agree up to runs of 4, counts up to runs of 5") {
    def maxRun(seq: Seq[String]): Int = {
      var best = 0; var cur = 0
      seq.foreach { t => if (t == "a") { cur += 1; best = math.max(best, cur) } else cur = 0 }
      best
    }
    for (n <- 0 to 8; seq <- allSeqs(Seq("a", "b"), n)) {
      val sm = stringMerge(seq, "a", "a"); val gm = greedyMerge(seq, "a", "a")
      if (maxRun(seq) <= 4) assert(sm === gm, s"sequence diverged on $seq")
      if (maxRun(seq) <= 5) assert(sm.length === gm.length, s"count diverged on $seq")
    }
    // the documented deviation: a run of 6 under-merges by one vs greedy
    val six = Seq.fill(6)("a")
    assert(greedyMerge(six, "a", "a").length === 3)
    assert(stringMerge(six, "a", "a").length === 4)
  }

  /** rank-order sequential application — the unrolled-oracle form the
    * kernel must equal for base-tokenization tables (no self-pairs) */
  private def sequential(tk: Seq[String], pairs: Seq[(String, String)]): Seq[String] =
    pairs.foldLeft(tk) { case (acc, (t1, t2)) => greedyMerge(acc, t1, t2) }

  test("BpeKernel: single t1 != t2 merge == canonical greedy (exhaustive, n <= 8)") {
    for (n <- 0 to 8; seq <- allSeqs(Seq("a", "b", "c"), n)) {
      val k = functions.BpeKernel.encode(seq.toArray, Array(("a", "b"))).toSeq
      assert(k === greedyMerge(seq, "a", "b"), s"kernel diverged on $seq")
    }
  }

  test("BpeKernel: multi-merge priority scan == rank-order sequential (exhaustive, n <= 7)") {
    // tables whose pairs come from the plain alphabet (the
    // base-tokenization shape the declared row feeds it): the kernel's
    // min-rank loop must equal the oracle's rank-order unroll exactly —
    // including tables where a later merge's pair overlaps an earlier
    // merge's tokens ((a,b) then (b,c), (b,c) then (a,b), chained (a,b)
    // + (c,a))
    val tables = Seq(
      Seq(("a", "b"), ("b", "c")),
      Seq(("b", "c"), ("a", "b")),
      Seq(("a", "b"), ("c", "a")),
      Seq(("c", "b"), ("b", "a"), ("a", "c")))
    for (table <- tables; n <- 0 to 7; seq <- allSeqs(Seq("a", "b", "c"), n)) {
      val k = functions.BpeKernel.encode(seq.toArray, table.toArray).toSeq
      assert(k === sequential(seq, table), s"kernel diverged on $seq with $table")
    }
  }

  test("BpeKernel: HIERARCHICAL trained tables == training-order sequential (exhaustive, n <= 7)") {
    // the q_text_bpe_train_kernel shape: later merges reference EARLIER
    // merges' output supertokens (operands containing chr(30)) — the
    // table an iterative trainer actually discovers. The kernel's
    // min-rank loop must still equal sequential application in training
    // order: rank i's operands only exist after ranks < i apply, and a
    // merge never creates an occurrence of an earlier-rank pair.
    val ab = "a" + J + "b"
    val tables = Seq(
      Seq(("a", "b"), (ab, "c")), // (ab) then ((ab)c)
      Seq(("a", "b"), ("c", ab)), // (ab) then (c(ab))
      Seq(("a", "b"), (ab, ab)), // self-pair of a SUPERtoken
      Seq(("a", "b"), (ab, "c"), (ab + J + "c", "a")), // 3-deep chain
      Seq(("b", "c"), ("a", "b" + J + "c"), ("a" + J + "b" + J + "c", "c")))
    for (table <- tables; n <- 0 to 7; seq <- allSeqs(Seq("a", "b", "c"), n)) {
      val k = functions.BpeKernel.encode(seq.toArray, table.toArray).toSeq
      assert(k === sequential(seq, table), s"kernel diverged on $seq with $table")
    }
  }

  test("BpeKernel: throughput is flat in table size (unmatched entries are free)") {
    // a large table of never-matching pairs must not slow the scan:
    // per-pair cost is one hash lookup regardless of table size
    val doc = Array.tabulate(5000)(i => s"t${i % 50}")
    val small = Array(("t1", "t2"))
    val big = small ++ Array.tabulate(2000)(i => (s"x$i", s"y$i"))
    def time(table: Array[(String, String)]): (Long, Seq[String]) = {
      val t = new functions.BpeKernel.Table(table)
      val t0 = System.nanoTime()
      var out: Array[String] = null
      for (_ <- 1 to 20) out = functions.BpeKernel.encode(doc, t)
      (System.nanoTime() - t0, out.toSeq)
    }
    time(big) // JIT warm-up for both shapes
    time(small)
    // min of 3 per shape and a 20x ceiling: the claim under test is
    // structural (~2000x for an O(table)-per-pair scan), and this host
    // has documented transient 2-4x stall windows — a wall-clock gate
    // tighter than that would flake with zero code defect
    val runsS = (1 to 3).map(_ => time(small))
    val runsB = (1 to 3).map(_ => time(big))
    assert(runsS.head._2 === runsB.head._2,
      "unmatched entries must not change the encoding")
    val (tSmall, tBig) = (runsS.map(_._1).min, runsB.map(_._1).min)
    assert(tBig < tSmall * 20,
      s"2001-entry table must not cost ~2000x the 1-entry table: " +
        s"${tBig / 1e6}ms vs ${tSmall / 1e6}ms")
  }

  test("trainLoop merges are invariant under the checkpoint cadence") {
    // VERDICT r13 #5: the lazy-checkpoint headroom is safe only if the
    // cadence can NEVER move a merge decision — each round's argmax
    // reads the same relation whether the previous encoding was
    // materialized or left as a chained projection. Pin it on real
    // documents across cadences 1 (the r13 eager shape), 2 (the
    // production cadence) and 3 (chains of two projections).
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val base = Tables(spark, TestSpark.sf0, "documents").limit(120)
      .select(col("doc_id"),
        graft.operators.TextAnalysis.bpeTs0ForSpec.as("ts"))
      .localCheckpoint()
    val results = Seq(1, 2, 3).map { k =>
      val (merges, enc) = graft.operators.TextAnalysis
        .bpeTrainLoopForSpec(base, rounds = 6, excludeSelf = true,
          checkpointEvery = k)
      val toks = graft.operators.TextAnalysis.bpeCorpusToksForSpec(enc)
      plans.Iterate.release(enc)
      (merges, toks)
    }
    assert(results(0)._1 === results(1)._1,
      "cadence 2 must pick the identical merge table")
    assert(results(0)._1 === results(2)._1,
      "cadence 3 must pick the identical merge table")
    assert(results.map(_._2).distinct.size === 1,
      "the final corpus token count must agree at every cadence")
    plans.Iterate.release(base)
  }

  test("trainLoop lookahead picks the identical merge chain as the sequential argmax") {
    // optimization r15 (VERDICT r14 #7): the top-K lookahead may only
    // skip a pair-count job when the collected counts PROVE the next
    // argmax; the merge table and final encoding must therefore be
    // bit-identical to the one-argmax-per-job chain, in both self-pair
    // regimes, on real documents (where certifications actually fire).
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val base = Tables(spark, TestSpark.sf0, "documents").limit(120)
      .select(col("doc_id"),
        graft.operators.TextAnalysis.bpeTs0ForSpec.as("ts"))
      .localCheckpoint()
    for (excludeSelf <- Seq(true, false)) {
      val (mSeq, encSeq) = graft.operators.TextAnalysis
        .bpeTrainLoopForSpec(base, rounds = 8, excludeSelf,
          checkpointEvery = 2, lookahead = false)
      val (mLook, encLook) = graft.operators.TextAnalysis
        .bpeTrainLoopForSpec(base, rounds = 8, excludeSelf,
          checkpointEvery = 2, lookahead = true)
      assert(mLook === mSeq,
        s"lookahead merge table diverged (excludeSelf=$excludeSelf)")
      val tSeq = graft.operators.TextAnalysis.bpeCorpusToksForSpec(encSeq)
      val tLook = graft.operators.TextAnalysis.bpeCorpusToksForSpec(encLook)
      assert(tLook === tSeq,
        s"lookahead final encoding diverged (excludeSelf=$excludeSelf)")
      Seq(encSeq, encLook).foreach(plans.Iterate.release)
    }
    plans.Iterate.release(base)
  }
}
