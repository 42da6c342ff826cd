package graft.ops

import graft.SparkSpec

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  // 12 words: title = "alpha beta gamma", nav = "alpha beta",
  // half = 6, p1 = words 4..6, p2 = words 7..12.
  private val doc12 = "alpha beta gamma delta echo fox " +
    "golf hotel india juliet kilo lima"

  private def df = Seq((1L, doc12)).toDF("doc_id", "text")

  test("extracted recovers clean text through script/style/comment traps") {
    val out = Html.extracted(df).collect()
    assert(out.length === 1)
    val expected = "alpha beta gamma alpha beta gamma delta echo fox " +
      "& more alpha beta menu link golf hotel india juliet kilo lima " +
      "copyright © alpha beta"
    assert(out.head.getAs[String]("text_clean") === expected)
    assert(out.head.getAs[Int]("n_chars") === expected.length)
  }

  test("extractText survives a bare < inside the script body") {
    val html = "<p>keep</p><script>if (1 < 2) { x(\"</p>\"); }</script>" +
      "<p>also</p>"
    val out = df.select(Html.extractText(
      org.apache.spark.sql.functions.lit(html)).as("t")).collect()
    assert(out.head.getString(0) === "keep also")
  }

  test("blockReport: five blocks, nav/footer flagged boilerplate") {
    val rows = Html.blockReport(df).orderBy("block_idx").collect()
    assert(rows.map(_.getAs[Int]("block_idx")).toSeq === Seq(1, 2, 3, 4, 5))
    val flags = rows.map(_.getAs[Boolean]("is_boilerplate")).toSeq
    // h1 "alpha beta gamma" (16 chars, no links) and both paragraphs are
    // content; the nav div and footer are all-anchor → density 1e6.
    assert(flags === Seq(false, false, true, false, true))
    val nav = rows(2)
    assert(nav.getAs[Long]("text_len") === nav.getAs[Long]("link_len"))
    assert(nav.getAs[Long]("link_density_micro") === 1000000L)
  }

  test("mainText keeps content blocks in page order; short title drops") {
    // Body blocks only: the h1 title once (the <title> head element is
    // not a block), then both paragraphs; nav/footer dropped.
    val main = Html.mainText(df).collect().head.getAs[String]("main_text")
    assert(main === "alpha beta gamma delta echo fox " +
      "& more golf hotel india juliet kilo lima")
    // 10 one-char words: h1 "a b c" (5 chars) and p2 "f g h i j"
    // (9 chars) both fall under the 10-char cut; p1 = "d e & more"
    // is 10 chars exactly → kept (>= is inclusive).
    val tiny = Seq((2L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val m2 = Html.mainText(tiny).collect().head.getAs[String]("main_text")
    assert(m2 === "d e & more")
  }

  test("plan evidence: the whole family is shuffle-free") {
    for (q <- Seq(Html.extracted(df), Html.blockReport(df),
        Html.mainText(df))) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"HTML extraction must stay a projection:\n$plan")
    }
  }
}
