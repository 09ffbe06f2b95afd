package graft.apps

import graft.apps.CorpusApp.CleanDoc
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property check for the bounded-heap admission kernel: over random
  * token counts, arrival orders, prior spend, and budgets, it must
  * admit EXACTLY the docs the naive sort-then-scan admits (strictly-
  * prior rule) and report the same final spend. Pure-JVM — no Spark —
  * so hundreds of cases are cheap. */
object BudgetAdmitProperties extends Properties("BudgetAdmit") {

  private val ts0 = java.sql.Timestamp.valueOf("2024-03-05 10:00:00").getTime

  private def doc(id: Long, tsOff: Int, tokens: Long): CleanDoc =
    CleanDoc(s"h$id", id, "t", "en", "web",
      new java.sql.Timestamp(ts0 + tsOff * 1000L), tokens, 0L, tokens)

  private val genDocs: Gen[List[CleanDoc]] = for {
    n <- Gen.chooseNum(0, 120)
    // duplicate-heavy ts offsets exercise the (ts, id) tiebreak; ids
    // are a shuffled range so keys stay unique
    offs <- Gen.listOfN(n, Gen.chooseNum(0, 9))
    toks <- Gen.listOfN(n, Gen.chooseNum(1L, 40L))
    ids <- Gen.const(new scala.util.Random(n.toLong * 7919 + offs.hashCode)
      .shuffle((0L until n.toLong).toList))
  } yield ids.lazyZip(offs).lazyZip(toks).map(doc).toList

  private def naive(docs: List[CleanDoc], spent0: Long,
      budget: Long): (List[CleanDoc], Long) = {
    var spent = spent0
    val out = docs.sortBy(d => (d.ingest_ts.getTime, d.doc_id)).flatMap { d =>
      if (spent < budget) { spent += d.ws_tokens; Some(d) } else None
    }
    (out, spent)
  }

  property("heap kernel ≡ naive sort-then-scan") =
    forAll(genDocs, Gen.chooseNum(0L, 400L), Gen.chooseNum(0L, 500L)) {
      (docs, spent0, budget) =>
        val (gotDocs, gotSpent) =
          CorpusApp.admitBounded(docs.iterator, spent0, budget)
        val (wantDocs, wantSpent) = naive(docs, spent0, budget)
        gotDocs.map(_.doc_id) == wantDocs.map(_.doc_id) &&
          gotSpent == wantSpent
    }

  property("zero-token docs do not break correctness") =
    forAll(Gen.chooseNum(0, 40), Gen.chooseNum(0L, 60L)) { (n, budget) =>
      // all-zero tokens: everything before the budget line is free
      val docs = (0 until n).map(i => doc(i.toLong, i % 5, 0L)).toList
      val (got, spent) = CorpusApp.admitBounded(docs.iterator, 0L, budget)
      val (want, wantSpent) = naive(docs, 0L, budget)
      got.map(_.doc_id) == want.map(_.doc_id) && spent == wantSpent
    }
}
