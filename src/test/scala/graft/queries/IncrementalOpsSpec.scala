package graft.queries

import graft.TestSpark
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** q142 invariants beyond the oracle rows: the verdicts are re-derived
  * independently driver-side (md5 + native minhash), and a controlled
  * fixture pins each verdict deterministically — a verbatim copy is
  * `exact_dup`, a word PERMUTATION of an indexed doc is `near_dup`
  * (minhash is a set signature, so the permuted doc's signature is
  * identical by construction, while its text hash differs), and a
  * disjoint-vocabulary doc is `new`.
  */
class IncrementalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def sig(text: String): Seq[Long] =
    (1 to 4).map { sd =>
      text.split(" ", -1).iterator.map { w =>
        graft.functions.GramHash.hashes(
          UTF8String.fromString(s"s$sd: " + w), 2).getLong(0)
      }.min
    }

  private def derive(docs: Seq[(Long, String)]): Map[Long, String] = {
    val (prior, fresh) = docs.partition(_._1 % 5 != 4)
    val priorMd5 = prior.map(d => md5hex(d._2)).toSet
    val bandsOf = (t: String) => {
      val g = sig(t); Set((g(0), g(1)), (g(2), g(3)))
    }
    val priorBuckets = prior.iterator.flatMap(d => bandsOf(d._2)).toSet
    fresh.map { case (id, t) =>
      id -> (if (priorMd5.contains(md5hex(t))) "exact_dup"
             else if (bandsOf(t).exists(priorBuckets)) "near_dup"
             else "new")
    }.toMap
  }

  test("q142 matches an independent driver-side re-derivation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = derive(docs)
    val got = IncrementalOps.crawlDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want)
    assert(want.size == docs.count(_._1 % 5 == 4))
  }

  test("q142 fixture: exact copy, permutation, and disjoint vocab") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_crawl").toString
    val indexed = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, indexed, "en", "src0", 46L),                       // prior
      (1L, "iota kappa lambda mu nu xi omicron pi", "en", "src0", 38L),
      (4L, indexed, "en", "src1", 46L),                       // verbatim copy
      (9L, "theta eta zeta epsilon delta gamma beta alpha",   // permutation
        "en", "src1", 46L),
      (14L, "rho sigma tau upsilon phi chi psi omega", "en", "src1", 39L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = IncrementalOps.crawlDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(4L -> "exact_dup", 9L -> "near_dup", 14L -> "new"))
    // and the harness agrees with itself on the fixture
    assert(got == derive(docs.map(d => (d._1, d._2))))
  }
}
