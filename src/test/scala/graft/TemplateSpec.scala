package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.template.{Api, Renderer}
import scala.collection.mutable

/** Mirrors reference renderer semantics (test_renderer.py / api.py). */
class TemplateSpec extends AnyFunSuite {

  private def ctx(vars: (String, Any)*): Map[String, Any] = Map(
    "context" -> Map("env" -> "test", "user" -> "alice"),
    "variables" -> mutable.Map(vars: _*),
    "API" -> Api)

  test("plain text passes through") {
    assert(Renderer.render("SELECT 1", ctx()) == "SELECT 1")
  }

  test("variable interpolation with << >>") {
    assert(Renderer.render("hello << context.user >>!", ctx()) == "hello alice!")
  }

  test("variables map access") {
    assert(Renderer.render("<< variables.x >>", ctx("x" -> 42L)) == "42")
  }

  test("typed inference: int, float, bool, null") {
    assert(Renderer.renderTyped("<< variables.x >>", ctx("x" -> 7L)) == 7L)
    assert(Renderer.renderTyped("3.5", ctx()) == 3.5)
    assert(Renderer.renderTyped("true", ctx()) == true)
    assert(Renderer.renderTyped("null", ctx()) == null)
  }

  test("@json prefix parses rendered JSON") {
    val v = Renderer.renderTyped("""@json{"a": << variables.x >>}""", ctx("x" -> 1L))
    assert(v == Map("a" -> 1L))
  }

  test("for loop with loop.last") {
    val t = "<% for c in variables.cols %><< c >><% if not loop.last %>,<% endif %><% endfor %>"
    assert(Renderer.render(t, ctx("cols" -> List("a", "b", "c"))) == "a,b,c")
  }

  test("if/elif/else") {
    val t = "<% if variables.x == 1 %>one<% elif variables.x == 2 %>two<% else %>many<% endif %>"
    assert(Renderer.render(t, ctx("x" -> 1L)) == "one")
    assert(Renderer.render(t, ctx("x" -> 2L)) == "two")
    assert(Renderer.render(t, ctx("x" -> 9L)) == "many")
  }

  test("comments are dropped") {
    assert(Renderer.render("a<# hidden #>b", ctx()) == "ab")
  }

  test("filters: int, bool, tojson, upper") {
    assert(Renderer.render("<< '12' | int >>", ctx()) == "12")
    assert(Renderer.render("<< variables.l | tojson >>", ctx("l" -> List(1L, 2L))) == "[1,2]")
    assert(Renderer.render("<< 'ab' | upper >>", ctx()) == "AB")
  }

  test("truthiness matches reference string_to_bool (util.py:169-188)") {
    assert(!Renderer.stringToBool("false"))
    assert(!Renderer.stringToBool("0"))
    assert(!Renderer.stringToBool("0.0"))
    assert(!Renderer.stringToBool("none"))
    assert(!Renderer.stringToBool(""))
    assert(!Renderer.stringToBool("[]"))
    assert(!Renderer.stringToBool("{}"))
    assert(!Renderer.stringToBool("()"))
    assert(Renderer.stringToBool("yes"))
    assert(Renderer.stringToBool("1"))
  }

  test("API.look dotted path with default") {
    val t = "<< API.look('loop_control.current', variables) >>"
    val vars = mutable.Map[String, Any](
      "loop_control" -> Map("current" -> "v1"))
    assert(Renderer.render(t, ctx() + ("variables" -> vars)) == "v1")
    val miss = "<< API.look('a.b.c', variables, 'dflt') >>"
    assert(Renderer.render(miss, ctx()) == "dflt")
  }

  test("API.look with list index") {
    val vars = mutable.Map[String, Any]("xs" -> Map("l" -> List(10L, 20L)))
    assert(Renderer.render("<< API.look('l[1]', variables.xs) >>",
      ctx() + ("variables" -> vars)) == "20")
  }

  test("API.sqltuple") {
    assert(Renderer.render("<< API.sqltuple(variables.v, 'str') >>",
      ctx("v" -> List("a", "b"))) == "('a','b')")
    assert(Renderer.render("<< API.sqltuple(variables.v, 'int') >>",
      ctx("v" -> List(1L, 2L))) == "(1,2)")
  }

  test("API.setvariable mutates the variables map") {
    val vars = mutable.Map[String, Any]()
    Renderer.render("<< API.setvariable(variables, 'k', 'v') >>",
      ctx() + ("variables" -> vars))
    assert(vars("k") == "v")
  }

  test("API.dt parses epoch seconds and ISO strings") {
    assert(Renderer.render("<< API.dt(1712361600) >>", ctx())
      .startsWith("2024-04-06T00:00:00"))
    assert(Renderer.render("<< API.dt('2024-04-06T12:00:00Z') >>", ctx())
      .startsWith("2024-04-06T12:00:00"))
  }

  test("comparison and arithmetic in expressions") {
    assert(Renderer.render("<< 2 + 3 * 4 >>", ctx()) == "14")
    assert(Renderer.renderTyped("<< 5 > 3 and 1 == 1 >>", ctx()) == true)
    assert(Renderer.renderTyped("<< not (variables.x in [1, 2]) >>", ctx("x" -> 3L)) == true)
  }

  test("API.error raises on truthy expr, renders empty otherwise") {
    val e = intercept[RuntimeException] {
      Renderer.render("<< API.error('true', 'boom') >>", ctx())
    }
    assert(e.getMessage.contains("boom"))
    assert(Renderer.render("a<< API.error('false', 'boom') >>b", ctx()) == "ab")
  }

  test("API.int coerces, API.peek passes the value through") {
    assert(Renderer.render("<< API.int('42') >>", ctx()) == "42")
    assert(Renderer.render("<< API.peek(7) >>", ctx()) == "7")
  }

  test("tokens spanning lines render (YAML block scalars wrap freely)") {
    assert(Renderer.render("<< 1 +\n   2 >>", ctx()) == "3")
    assert(Renderer.render("<% if true\n%>yes<% endif %>", ctx()) == "yes")
  }

  test("and/or short-circuit: guarded RHS neither runs nor crashes") {
    assert(Renderer.renderTyped(
      "<< variables.n != 0 and 10 % variables.n == 0 >>", ctx("n" -> 0L)) == false)
    assert(Renderer.renderTyped(
      "<< variables.n == 0 or 10 % variables.n == 0 >>", ctx("n" -> 0L)) == true)
    // short-circuited API.error must not fire
    assert(Renderer.renderTyped(
      "<< false and API.error('true', 'boom') >>", ctx()) == false)
  }

  test("trailing garbage after a valid prefix is an error, not ignored") {
    intercept[Exception] {
      Renderer.renderTyped("<< variables.x && variables.x >>", ctx("x" -> true))
    }
  }

  test("method call on a non-API receiver errors instead of Api dispatch") {
    val e = intercept[Exception] {
      Renderer.renderTyped("<< variables.rec.dt('2024-01-01') >>",
        ctx("rec" -> Map("a" -> 1)))
    }
    assert(e.getMessage.contains("cannot call"))
  }

  test("API.dt preserves timezone offsets (arrow.get parity)") {
    assert(Renderer.render("<< API.dt('2024-06-01T12:00:00+05:30') >>", ctx())
      .startsWith("2024-06-01T06:30:00"))
    // ints > 1e10 are nanoseconds (api.py:47-49)
    assert(Renderer.render("<< API.dt(1712361600000000000) >>", ctx())
      .startsWith("2024-04-06T00:00:00"))
  }

  test("tojson renders the mutable variables map as a JSON object") {
    val out = Renderer.render("<< variables|tojson >>", ctx("k" -> 1L))
    assert(out.contains("\"k\""))
    assert(out.trim.startsWith("{"))
  }

  test("dict.get with and without default (test_safe_containers parity)") {
    assert(Renderer.renderTyped("<< variables.get('num') >>",
      ctx("num" -> 5L)) == 5L)
    assert(Renderer.renderTyped("<< variables.get('missing', 7) >>",
      ctx()) == 7L)
    // a missing key without default is None → typed null (Jinja parity)
    assert(Renderer.renderTyped("<< variables.get('missing') >>", ctx()) == null)
    // YAML map keys stringify, so a literal integer key must still hit
    // the string-keyed entry ("1") instead of silently defaulting
    assert(Renderer.renderTyped("<< variables.get(1, 9) >>",
      ctx("1" -> 42L)) == 42L)
    // DOCUMENTED DIVERGENCE (one-directional fallback): in the Python
    // reference a YAML int key stays an int, so d.get('1') against
    // {1: v} returns the default there; here keys are stringified at
    // load (Stages.toScala), so the string-form lookup finds the value.
    // Acceptable because every map that reaches templates is already
    // string-keyed — this pin exists so a behavior change is deliberate.
    assert(Renderer.renderTyped("<< variables.get('1', 9) >>",
      ctx("1" -> 42L)) == 42L)
  }

  test("dunder attributes are gated to empty, sunder passes (security parity)") {
    // test_safe_containers: vars.__ver -> "" even though the key exists
    assert(Renderer.render("<< variables.__ver >>", ctx("__ver" -> "12")) == "")
    assert(Renderer.render("<< variables._ver >>", ctx("_ver" -> "1.2.0"))
      == "1.2.0")
  }
}
