package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curation.extractLinks / linkHostEdges: anchors → host edge list. */
class LinkSpec extends SparkSpec {
  import spark.implicits._

  test("extractLinks pulls every double-quoted href in order") {
    val html =
      """<html><a href="https://a.com/1">x</a><p>t</p>
        |<a class="z" href="/rel">y</a><a href="mailto:m@n.o">m</a>
        |<a href="https://b.com/2">z</a></html>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(Curation.extractLinks(col("h")).as("l"))
      .first().getSeq[String](0)
    assert(got === Seq("https://a.com/1", "/rel", "mailto:m@n.o", "https://b.com/2"))
  }

  test("extractLinks matches only <a> tags — <area>/<audio> hrefs are not links") {
    val html =
      """<map><area shape="rect" href="https://map.example/x">m</area></map>
        |<audio src="s.mp3" href="https://audio.example/y"></audio>
        |<a href="https://real.example/z">ok</a>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(Curation.extractLinks(col("h")).as("l"))
      .first().getSeq[String](0)
    assert(got === Seq("https://real.example/z"))
  }

  test("linkHostEdges normalizes hosts and drops hostless targets") {
    val rows = Seq(
      ("s1.com",
        """<a href="https://www.A.com:443/p">1</a><a href="/r">2</a>
          |<a href="mailto:x@y.z">3</a><a href="http://user:pw@a.com./q">4</a>""".stripMargin),
      ("s2.com", """<a href="https://b.org/1">5</a><a href="https://b.org/2">6</a>"""))
      .toDF("src", "html")
    val got = Curation.linkHostEdges(rows, "html", col("src"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // www./port/userinfo/trailing-dot all collapse to a.com; relative +
    // mailto dropped; parallel links pre-summed
    assert(got === Map(("s1.com", "a.com") -> 2L, ("s2.com", "b.org") -> 2L))
  }

  test("host edges feed PageRank end to end") {
    val rows = Seq(
      ("one.com", """<a href="https://two.com/a">l</a>"""),
      ("two.com", """<a href="https://one.com/b">l</a>"""),
      ("three.com", """<a href="https://one.com/c">l</a>"""))
      .toDF("src", "html")
    val edges = Curation.linkHostEdges(rows, "html", col("src"))
      .select(conv(substring(md5(col("src_host")), 1, 8), 16, 10).cast("long").as("src"),
        conv(substring(md5(col("dst_host")), 1, 8), 16, 10).cast("long").as("dst"),
        col("w"))
    val r = graft.operators.PageRank.rank(edges, "src", "dst", Some("w"), iters = 10)
    assert(r.count() === 3L)
    assert(r.agg(sum("pr")).first().getLong(0) > 2900000L) // ~3e6 minus dust
  }
}
