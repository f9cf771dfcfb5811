object Dbg extends App {
  import graft.html._
  import graft.algo._
  val src = java.nio.file.Files.readString(java.nio.file.Paths.get(
    "/root/reference/Tests/ReadabilityTests/Resources/realworld-pages/webmd-1/source.html"))
  val dom = Parser.parse(src)
  val c = Select.selectFirst(dom, dom.document, "div.author_fmt")
  println("container=" + c)
  if (c != -1) {
    println("html=[" + Serialize.innerHtml(dom, c).take(300) + "]")
    val link = Select.selectFirst(dom, c, "a[rel=author]")
    println("link=" + link)
  }
  // herald sun
  val src2 = java.nio.file.Files.readString(java.nio.file.Paths.get(
    "/root/reference/Tests/ReadabilityTests/Resources/realworld-pages/herald-sun-1/source.html"))
  val dom2 = Parser.parse(src2)
  println("readmore=" + Select.selectFirst(dom2, dom2.document, "#read-more-link"))
  val r = Readability.parse(src2, "http://fakehost/test/index.html", FixtureRunner.mozillaOptions)
  r match { case Readability.Ok(res) => println("byline=[" + res.byline.getOrElse("null") + "]"); case f => println(f) }
}
