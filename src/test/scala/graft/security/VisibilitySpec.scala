package graft.security

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.security.Visibility._

/** Grammar + evaluation cases ported from the reference's
  * VisibilityEvaluatorTest (geomesa-security/src/test/scala/.../
  * VisibilityEvaluatorTest.scala shapes). */
class VisibilitySpec extends AnyFunSuite with SparkTest {

  test("empty visibilities are unrestricted") {
    assert(Visibility.parse(null) == VisNone)
    assert(Visibility.parse("") == VisNone)
    assert(Visibility.canSee(null, Set()) && Visibility.canSee("", Set()))
  }

  test("simple and quoted values") {
    assert(Visibility.parse("user") == Value("user"))
    assert(Visibility.parse("'user'") == Value("user"))
    assert(Visibility.parse("\"user\"") == Value("user"))
  }

  test("chained booleans") {
    assert(Visibility.parse("user&admin&test") ==
      And(Seq(Value("user"), Value("admin"), Value("test"))))
    assert(Visibility.parse("user|admin|test") ==
      Or(Seq(Value("user"), Value("admin"), Value("test"))))
    assert(Visibility.parse("user&'admin'&\"test\"") ==
      And(Seq(Value("user"), Value("admin"), Value("test"))))
  }

  test("nested booleans and precedence (OR binds tighter than AND)") {
    assert(Visibility.parse("(user&admin)|test") ==
      Or(Seq(And(Seq(Value("user"), Value("admin"))), Value("test"))))
    assert(Visibility.parse("user&(admin|test)") ==
      And(Seq(Value("user"), Or(Seq(Value("admin"), Value("test"))))))
    // without parens: a|b&c == And(Or(a,b), c), per the reference grammar
    assert(Visibility.parse("user|admin&test") ==
      And(Seq(Or(Seq(Value("user"), Value("admin"))), Value("test"))))
  }

  test("evaluation against auth sets") {
    assert(Visibility.canSee("user", Set("user", "admin")))
    assert(!Visibility.canSee("user", Set("admin", "test")))
    assert(!Visibility.canSee("user", Set()))
    assert(Visibility.canSee("user&admin&test", Set("user", "admin", "test")))
    assert(!Visibility.canSee("user&admin&test", Set("user", "admin")))
    assert(Visibility.canSee("user|admin|test", Set("test")))
    assert(!Visibility.canSee("user|admin|test", Set("other")))
    assert(Visibility.canSee("(user&admin)|test", Set("test")))
    assert(Visibility.canSee("(user&admin)|test", Set("user", "admin")))
    assert(!Visibility.canSee("(user&admin)|test", Set("user")))
    assert(Visibility.canSee("user&(admin|test)", Set("user", "test")))
    assert(!Visibility.canSee("user&(admin|test)", Set("admin", "test")))
  }

  test("invalid expressions fail loudly") {
    for (bad <- Seq("user&", "|user", "user&&admin", "(user", "user)",
                    "us er", "user!", "''", "'unterminated"))
      intercept[IllegalArgumentException](Visibility.parse(bad))
  }

  test("filterAuthorized keeps exactly the visible rows") {
    import spark.implicits._
    val df = Seq(
      (1L, ""), (2L, "admin"), (3L, "user&system"), (4L, "admin|user"),
      (5L, "secret&(alpha|beta)"), (6L, null.asInstanceOf[String])
    ).toDF("id", "vis")
    val visible = Visibility.filterAuthorized(df, "vis", Seq("admin", "user", "alpha"))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(visible == Seq(1L, 2L, 4L, 6L))
  }

  test("attribute-level visibility: unauthorized attributes null out, rows with " +
    "no authorized attribute vanish (AccumuloDataStoreAttributeVisibilityTest)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the reference fixture: (name, age, dtg, geom) with per-attribute
    // labels; 'mixed' carries admin,user,admin,user
    val df = Seq(
      ("user", "name-user", 10, "2014-01-01", "user,user,user,user"),
      ("admin", "name-admin", 11, "2014-01-02", "admin,admin,admin,admin"),
      ("mixed", "name-mixed", 12, "2014-01-03", "admin,user,admin,user")
    ).toDF("id", "name", "age", "dtg", "vis")
    val attrs = Seq("name", "age", "dtg")

    def rows(auths: String*) =
      Visibility.maskAttributes(df, "vis", attrs, auths)
        .select("id", "name", "age", "dtg").collect()
        .map(r => r.getString(0) -> (Option(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getInt(2)), Option(r.getString(3)))).toMap

    // full auths: every feature, every attribute
    val full = rows("admin", "user")
    assert(full.keySet == Set("user", "admin", "mixed"))
    assert(full("mixed") == ((Some("name-mixed"), Some(12), Some("2014-01-03"))))

    // user-only: admin feature vanishes; mixed keeps only user-labeled attrs
    val u = rows("user")
    assert(u.keySet == Set("user", "mixed"))
    assert(u("user") == ((Some("name-user"), Some(10), Some("2014-01-01"))))
    assert(u("mixed") == ((None, Some(12), None)))

    // admin-only: user feature vanishes; mixed keeps admin-labeled attrs
    val a = rows("admin")
    assert(a.keySet == Set("admin", "mixed"))
    assert(a("mixed") == ((Some("name-mixed"), None, Some("2014-01-03"))))

    // no auths: nothing survives
    assert(rows().isEmpty)
  }
}
