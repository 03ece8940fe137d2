package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** HTML → text extraction and URL canonicalization rules. */
class WebTextSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def text1(html: String): String =
    Seq(html).toDF("h").select(WebText.htmlToText(col("h"))).head().getString(0)

  private def canon1(url: String): String =
    Seq(url).toDF("u").select(WebText.canonicalizeUrl(col("u"))).head().getString(0)

  test("htmlToText: scripts/styles/comments dropped, entities, whitespace") {
    assert(text1("<p>a</p><script>ignore '<b>x</b>'</script><p>b</p>") == "a b")
    assert(text1("<style type=\"text/css\">p { color: red }</style>hi") == "hi")
    assert(text1("pre<!-- multi\nline\ncomment -->post") == "pre post")
    // entity decode order: &amp;lt; must become literal "&lt;", not "<"
    assert(text1("x &amp;lt; y &amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39;") ==
      "x &lt; y & <tag> \"q\" 's'")
    assert(text1("  a\n\n\t b   c ") == "a b c")
    // multi-line tags and attributes with > quirks
    assert(text1("<div\n class=\"x\">inner</div>") == "inner")
  }

  test("htmlTitle and htmlLinks") {
    val h = "<html><head><TITLE> T </TITLE></head><body>" +
      "<a href=\"https://a.com/1\">one</a> <a class=x href=\"/rel\">two</a></body>"
    val row = Seq(h).toDF("h").select(WebText.htmlTitle(col("h")),
      WebText.htmlLinks(col("h"))).head()
    assert(row.getString(0) == "T")
    assert(row.getSeq[String](1) == Seq("https://a.com/1", "/rel"))
  }

  test("linkDensity: link soup scores high, prose scores low") {
    val soup = "<body>" + (1 to 10).map(i =>
      s"""<a href="/$i">navigation item $i</a>""").mkString(" ") + "</body>"
    val prose = "<body><p>" + ("word " * 200) +
      "</p><a href=\"/x\">one link</a></body>"
    val d = Seq(soup, prose).toDF("h")
      .select(WebText.linkDensity(col("h"))).collect().map(_.getDouble(0))
    assert(d(0) > 0.9, s"soup density ${d(0)}")
    assert(d(1) < 0.05, s"prose density ${d(1)}")
  }

  test("blocks + mainContent: prose survives, nav/footer link soup drops") {
    val prose1 = "This is the first real paragraph of the article with " +
      "enough words to clear the minimum character floor easily."
    val prose2 = "A second substantive paragraph follows with more real " +
      "content and a single inline <a href=\"/ref\">reference</a> link."
    val page = "<html><head><script>nav.init()</script></head><body>" +
      "<nav>" + (1 to 8).map(i => s"""<a href="/$i">menu item $i</a>""").mkString(" ") + "</nav>" +
      s"<article><h1>Title words here</h1><p>$prose1</p><p>$prose2</p></article>" +
      "<footer><a href=\"/tos\">terms</a> <a href=\"/priv\">privacy</a></footer>" +
      "</body></html>"
    val row = Seq(page).toDF("h")
      .select(WebText.mainContent(col("h")).as("main"),
        size(WebText.blocks(col("h"))).as("nblocks")).head()
    val main = row.getString(0)
    // both prose paragraphs kept (inline link text stays inside its block)
    assert(main.contains("first real paragraph"))
    assert(main.contains("second substantive paragraph") && main.contains("reference"))
    // nav menu, footer links, short title block all dropped
    assert(!main.contains("menu item") && !main.contains("privacy") &&
      !main.contains("Title words"))
    assert(row.getInt(1) >= 4) // nav, title, 2 prose, footer blocks seen
    // a page that is ALL soup extracts to empty
    val soup = "<body>" + (1 to 9).map(i =>
      s"""<a href="/$i">long navigation entry number $i for the menu</a>""").mkString(" ") + "</body>"
    val m2 = Seq(soup).toDF("h")
      .select(WebText.mainContent(col("h"))).head().getString(0)
    assert(m2 == "")
  }

  test("canonicalizeUrl: case, www, ports, params, fragments, slashes") {
    // scheme+host lowercase, www and default port dropped, path case kept
    assert(canon1("HTTP://WWW.Ex.COM:80/Path/") == "http://ex.com/Path")
    assert(canon1("https://ex.com:443/") == "https://ex.com/")
    // non-default port kept
    assert(canon1("http://ex.com:8080/a") == "http://ex.com:8080/a")
    // tracking params dropped, the rest sorted; fragment dropped
    assert(canon1("https://ex.com/p?utm_source=t&b=2&a=1#frag") ==
      "https://ex.com/p?a=1&b=2")
    // all params tracking → no query at all
    assert(canon1("https://ex.com/p?utm_campaign=x&fbclid=y") ==
      "https://ex.com/p")
    // empty path → "/", query preserved
    assert(canon1("https://Ex.com?b=2&a=1") == "https://ex.com/?a=1&b=2")
    // non-URLs pass through untouched
    assert(canon1("not a url") == "not a url")
    // the dedup shape: both variants collapse to one key
    assert(canon1("HTTPS://WWW.EX.COM/a/?utm_source=f&b=2&a=1#top") ==
      canon1("https://ex.com/a?a=1&b=2"))
  }
}
