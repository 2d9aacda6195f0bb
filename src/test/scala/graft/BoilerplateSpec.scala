package graft

import graft.extract.Boilerplate

class BoilerplateSpec extends SparkSpec {

  private val page =
    """<html><head><title>t</title></head><body>
      |<div class="nav"><a href="/">home</a> <a href="/a">about</a> <a href="/c">contact</a></div>
      |<p>this paragraph has more than ten words of real content in it for sure</p>
      |<div class="ads">buy now best cheap deals</div>
      |<p>and a second long paragraph with plenty of words to clear the bar</p>
      |<footer>copyright example site all rights reserved</footer>
      |</body></html>""".stripMargin.replace("\n", "")

  test("segmentation finds top-level blocks, title is not a block") {
    val bs = Boilerplate.blocks(page)
    assert(bs.map(_.tag) == Seq("div", "p", "div", "p", "footer"))
    assert(!bs.exists(_.text.contains("t</title>")))
  }

  test("classification: short, linky and footer blocks drop; paragraphs keep") {
    val (nb, nk, kept) = Boilerplate.extract(page)
    assert(nb == 5 && nk == 2)
    assert(kept ==
      "this paragraph has more than ten words of real content in it for sure\n" +
        "and a second long paragraph with plenty of words to clear the bar")
  }

  test("link density kills long link lists even past the word bar") {
    val linky = "<div>" + (1 to 12).map(i =>
      s"""<a href="/$i">link number $i</a>""").mkString(" ") + "</div>"
    val (nb, nk, _) = Boilerplate.extract(linky)
    assert(nb == 1 && nk == 0)
  }

  test("nested same-tag blocks flatten into the outer block") {
    val nested = "<div>outer one two three four five " +
      "<div>inner six seven eight nine ten</div> tail</div>"
    val bs = Boilerplate.blocks(nested)
    assert(bs.length == 1)
    assert(bs.head.text.contains("inner six") && bs.head.text.contains("tail"))
    val (_, nk, _) = Boilerplate.extract(nested)
    assert(nk == 1) // 12 words, no links
  }

  test("nested different block tags flatten too") {
    val mixed = "<div>alpha beta <p>gamma delta epsilon zeta eta theta</p> omega</div>"
    val bs = Boilerplate.blocks(mixed)
    assert(bs.length == 1)
    assert(bs.head.words == 9)
  }

  test("tolerant: null, empty, unterminated block, stray close tags") {
    assert(Boilerplate.blocks(null).isEmpty)
    assert(Boilerplate.blocks("").isEmpty)
    assert(Boilerplate.blocks("no tags at all").isEmpty)
    val unterminated = "<p>dangling words one two three"
    assert(Boilerplate.blocks(unterminated).head.text ==
      "dangling words one two three")
    assert(Boilerplate.blocks("</p></div><p>ok</p>").map(_.text) == Seq("ok"))
  }

  test("column form over a DataFrame") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = Seq((1L, page)).toDF("id", "html")
      .select(col("id"), Boilerplate.extractUdf()(col("html")).as("e"))
      .selectExpr("e._1 as nb", "e._2 as nk")
      .as[(Long, Long)].head()
    assert(got == ((5L, 2L)))
  }
}
