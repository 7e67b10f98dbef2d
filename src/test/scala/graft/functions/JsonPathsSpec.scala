package graft.functions

import graft.SparkSpec
import graft.functions.GraftFunctions.jsonPath
import org.apache.spark.sql.functions._

/** Full-dialect JSONPath (reference `DslRecordMapping.java:587-594` uses
  * jayway json-path 2.4; syntax per goessner) — evaluator unit tests on the
  * goessner store document, plus DataFrame/codegen round trips. */
class JsonPathsSpec extends SparkSpec {

  private val store =
    """{ "store": {
      |    "book": [
      |      { "category": "reference", "author": "Nigel Rees",
      |        "title": "Sayings of the Century", "price": 8.95 },
      |      { "category": "fiction", "author": "Evelyn Waugh",
      |        "title": "Sword of Honour", "price": 12.99 },
      |      { "category": "fiction", "author": "Herman Melville",
      |        "title": "Moby Dick", "isbn": "0-553-21311-3", "price": 8.99 },
      |      { "category": "fiction", "author": "J. R. R. Tolkien",
      |        "title": "The Lord of the Rings", "isbn": "0-395-19395-8",
      |        "price": 22.99 }
      |    ],
      |    "bicycle": { "color": "red", "price": 19.95 }
      |  }
      |}""".stripMargin

  private def eval(path: String): String =
    JsonPaths.evalToJson(store, JsonPaths.compile(path))

  test("definite paths: dotted, bracketed, indexed; unquoted scalars") {
    assert(eval("$.store.book[0].title") === "Sayings of the Century")
    assert(eval("$['store']['bicycle']['color']") === "red")
    assert(eval("$.store.book[1].price") === "12.99")
    assert(eval("$.store.book[-1].author") === "J. R. R. Tolkien")
    assert(eval("$.store.nothing") === null)          // definite miss -> absent
    assert(eval("$.store.book[9]") === null)
    assert(JsonPaths.evalToJson("""{"a":null}""", JsonPaths.compile("$.a")) === null)
    assert(JsonPaths.evalToJson("not json", JsonPaths.compile("$.a")) === null)
  }

  test("wildcards and recursive descent collect in document order") {
    val authors = """["Nigel Rees","Evelyn Waugh","Herman Melville","J. R. R. Tolkien"]"""
    assert(eval("$.store.book[*].author") === authors)
    assert(eval("$..author") === authors)
    assert(eval("$..price") === "[8.95,12.99,8.99,22.99,19.95]")
    assert(eval("$..book[2].title") === """["Moby Dick"]""")
    // $..* = every node except the root itself
    assert(eval("$..*").length > 100)
    assert(eval("$.store.*").contains("\"color\":\"red\""))
  }

  test("slices and unions") {
    assert(eval("$..book[-1:].title") === """["The Lord of the Rings"]""")
    assert(eval("$..book[:2].title") === """["Sayings of the Century","Sword of Honour"]""")
    assert(eval("$..book[0,1].title") === """["Sayings of the Century","Sword of Honour"]""")
    assert(eval("$.store.book[::2].title") === """["Sayings of the Century","Moby Dick"]""")
    assert(eval("$.store.book[1:3].price") === "[12.99,8.99]")
    assert(eval("$['store']['book'][0]['category','author']") ===
      """["reference","Nigel Rees"]""")
  }

  test("filter predicates: exists, comparisons, boolean algebra, $ refs") {
    assert(eval("$..book[?(@.isbn)].title") === """["Moby Dick","The Lord of the Rings"]""")
    assert(eval("$.store.book[?(@.price < 10)].title") ===
      """["Sayings of the Century","Moby Dick"]""")
    assert(eval("$.store.book[?(@.category == 'fiction' && @.price < 10)].title") ===
      """["Moby Dick"]""")
    assert(eval("$.store.book[?(@.price < 9 || @.price > 20)].title") ===
      """["Sayings of the Century","Moby Dick","The Lord of the Rings"]""")
    assert(eval("$.store.book[?(!(@.isbn))].title") ===
      """["Sayings of the Century","Sword of Honour"]""")
    // document-root reference inside a predicate
    assert(eval("$..book[?(@.price <= $.store.bicycle.price)].title") ===
      """["Sayings of the Century","Sword of Honour","Moby Dick"]""")
    assert(eval("$.store.book[?(@.category != 'fiction')].title") ===
      """["Sayings of the Century"]""")
    // missing operand -> element dropped, not an error
    assert(eval("$.store.book[?(@.isbn == '0-553-21311-3')].title") === """["Moby Dick"]""")
  }

  test("path functions and script indexes") {
    assert(eval("$.store.book.length()") === "4")
    assert(eval("$..book.length()") === "[4]")
    assert(eval("$.store.book[(@.length-1)].title") === "The Lord of the Rings")
    assert(eval("$.store.book[(@.length-4)].title") === "Sayings of the Century")
    assert(eval("$.store.keys()") === """["book","bicycle"]""")
    assert(eval("$.store.book.first().author") === "Nigel Rees")
    assert(eval("$.store.book.last().author") === "J. R. R. Tolkien")
    val nums = """{"n":[3,1,2]}"""
    def evalOn(json: String, p: String) = JsonPaths.evalToJson(json, JsonPaths.compile(p))
    assert(evalOn(nums, "$.n.min()") === "1.0")
    assert(evalOn(nums, "$.n.max()") === "3.0")
    assert(evalOn(nums, "$.n.sum()") === "6.0")
    assert(evalOn(nums, "$.n.avg()") === "2.0")
    assert(evalOn(nums, "$.n.length()") === "3")
    // functions on the wrong node type are a miss, not an error
    assert(evalOn(nums, "$.n.keys()") === null)
  }

  test("parameterized functions: stddev, concat, append (jayway set)") {
    def evalOn(json: String, p: String) = JsonPaths.evalToJson(json, JsonPaths.compile(p))
    val nums = """{"n":[3,1,2]}"""
    // population stddev of 1,2,3: sqrt(2/3)
    assert(math.abs(evalOn(nums, "$.n.stddev()").toDouble -
      math.sqrt(2.0 / 3.0)) < 1e-12)
    assert(evalOn(nums, "$.n.append(4, 5).length()") === "5")
    assert(evalOn(nums, "$.n.append(4).sum()") === "10.0")
    assert(evalOn("""{"s":"ab"}""", "$.s.concat('-', 'cd')") === "ab-cd")
    assert(evalOn("""{"a":["x","y"]}""", "$.a.concat('!')") === "xy!")
    // append on a non-array is a miss, not an error
    assert(evalOn("""{"s":"ab"}""", "$.s.append(1)") === null)
    intercept[IllegalArgumentException](JsonPaths.compile("$.n.append(4,")) // unterminated args
  }

  test("indefinite paths with no matches yield an empty array, not null") {
    assert(eval("$..nosuchfield") === "[]")
    assert(eval("$.store.book[?(@.price > 100)]") === "[]")
  }

  test("malformed paths fail at compile (plan) time") {
    intercept[IllegalArgumentException](JsonPaths.compile("$.store.book[?(@.price <)]"))
    intercept[IllegalArgumentException](JsonPaths.compile("$.store..["))
    intercept[IllegalArgumentException](JsonPaths.compile("$[1:2:0]")) // zero step
  }

  test("Column API: simple paths route to get_json_object, both agree") {
    import spark.implicits._
    val df = Seq(store).toDF("j")
    val r = df.select(
      jsonPath(col("j"), "$.store.bicycle.color").as("simple"),
      jsonPath(col("j"), "$['store']['bicycle']['color']").as("full"),
      jsonPath(col("j"), "$..book[?(@.price < 10)].author").as("filtered"))
      .head()
    assert(r.getString(0) === "red")
    assert(r.getString(1) === "red")
    assert(r.getString(2) === """["Nigel Rees","Herman Melville"]""")
    // routing: the simple path must compile to GetJsonObject, not our expr
    val plan = df.select(jsonPath(col("j"), "$.store.bicycle.color"))
      .queryExecution.analyzed.toString()
    assert(plan.contains("get_json_object"))
  }
}
