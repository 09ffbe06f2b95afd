package graft.apps

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class DimAppSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DimApp streams envelopes into per-dim parquet with pk keep-latest") {
    implicit val ctx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("dims").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val config = () => Seq(("base_trademark", "dim_base_trademark", "id,tm_name", "id"))
      .toDF("source_table", "sink_table", "sink_columns", "sink_pk")
    val mem = MemoryStream[String]
    val q = DimApp.run(mem.toDF().toDF("value"), config, out, ckpt)
    try {
      mem.addData(
        """{"database":"g","table":"base_trademark","type":"insert","ts":1,"xid":1,"xoffset":1,"data":{"id":"1","tm_name":"acme","noise":"drop-me"},"old":null}""",
        """{"database":"g","table":"base_trademark","type":"update","ts":2,"xid":2,"xoffset":1,"data":{"id":"1","tm_name":"acme2"},"old":{"tm_name":"acme"}}""",
        """{"database":"g","table":"unrouted","type":"insert","ts":3,"xid":3,"xoffset":1,"data":{"id":"9"},"old":null}""")
      q.processAllAvailable()
      val dim = spark.read.parquet(s"$out/dim_base_trademark").collect()
      assert(dim.length == 1) // pk dedup kept the latest
      assert(dim.head.getAs[String]("tm_name") == "acme2")
      assert(!dim.head.schema.fieldNames.contains("noise")) // column pruning
      // batch 2: a NEW pk plus an update to pk 1 — earlier rows must
      // survive the write (merge, not overwrite-with-batch)
      mem.addData(
        """{"database":"g","table":"base_trademark","type":"insert","ts":4,"xid":4,"xoffset":1,"data":{"id":"2","tm_name":"bolt"},"old":null}""")
      q.processAllAvailable()
      // batch 3: unrelated table only — dim_base_trademark untouched
      mem.addData(
        """{"database":"g","table":"unrouted","type":"insert","ts":5,"xid":5,"xoffset":1,"data":{"id":"9"},"old":null}""")
      q.processAllAvailable()
      val dim2 = spark.read.parquet(s"$out/dim_base_trademark").collect()
      assert(dim2.length == 2) // pk 1 survived the later batches
      val byId = dim2.map(r => r.getAs[String]("id") -> r.getAs[String]("tm_name")).toMap
      assert(byId == Map("1" -> "acme2", "2" -> "bolt"))
    } finally q.stop()
  }

  test("GraftExtensions makes vec_dot available session-wide (SQL string)") {
    import org.apache.spark.sql.SparkSession
    // getOrCreate reuses the shared test session (extensions apply only at
    // session creation) — clear it so a NEW session builds on the same
    // SparkContext with the extensions wired, then restore.
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = graft.GraftSession.local(2)
      val r = s2.sql(
        "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp").head()
      assert(r.getDouble(0) == 11.0)
      // the whole native-function surface rides the same extension
      val g = s2.sql("SELECT gram_hashes('a b c', 2) AS h").head()
      assert(g.getSeq[Long](0).length == 2)
      val tk = s2.sql(
        """SELECT topk_by(v, k, 2) AS top FROM
          |  VALUES (1.0d, 'a'), (3.0d, 'b'), (2.0d, 'c') AS t(v, k)
          |""".stripMargin).head()
      assert(tk.getSeq[String](0) == Seq("b", "c"))
      val hh = s2.sql(
        """SELECT heavy_hitters(k, 4) AS hh FROM
          |  VALUES ('x'), ('x'), ('y') AS t(k)""".stripMargin).head()
      assert(hh.getSeq[org.apache.spark.sql.Row](0)
        .map(e => e.getString(0) -> e.getLong(1)).toMap ==
        Map("x" -> 2L, "y" -> 1L))
    } finally {
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
