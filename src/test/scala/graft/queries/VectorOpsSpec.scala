package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("IVF nprobe=1 results are a subset of the full ranking with identical sims") {
    val brute = VectorOps.queries("q33_cosine_topk")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val full = {
      graft.functions.VecOps.register(spark)
      import graft.functions.VecOps._
      import org.apache.spark.sql.functions._
      val e = graft.Tables.embeddings(spark, sf)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qemb"))
      e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"), vec_cosine(col("embedding"), col("qemb")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    val ivf = SimHashIvf.queries("q39_ann_ivf")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    // every IVF hit carries the exact brute-force similarity
    assert(ivf.forall { case (id, s) => full(id) == s })
    // brute-force top-10 values come from the full ranking too
    assert(brute.forall { case (id, s) => full(id) == s })
  }

  test("simhash of identical docs is identical; fingerprints fit in 16 bits") {
    val sh = SimHashIvf.simhash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh.values.forall(v => v >= 0 && v < (1 << 16)))
    // documents with identical text must collide (dup detection property)
    import spark.implicits._
    val texts = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val byText = texts.groupBy(_._2).values.filter(_.size > 1)
    byText.foreach { grp =>
      val fps = grp.keys.map(sh).toSet
      assert(fps.size == 1)
    }
  }
}
