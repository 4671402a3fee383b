package graft

import graft.functions.JwtFunctions
import org.apache.spark.sql.functions._

class JwtSpec extends SparkSpec {
  import spark.implicits._

  private def b64url(s: String): String =
    java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(s.getBytes("UTF-8"))

  test("jwt claim extraction surfaces the tenant (no signature check)") {
    val header = b64url("""{"alg":"RS256","kid":"k1"}""")
    val payload = b64url(
      """{"sub":"u-1","custom:tenantId":"acme","cognito:username":"alice","exp":"1999999999"}""")
    val token = s"$header.$payload.fakesig"
    val df = Seq(s"Bearer $token").toDF("auth")
    val tenant = df.select(
      JwtFunctions.jwtTenantId(JwtFunctions.stripBearer($"auth"))).as[String].head()
    assert(tenant == "acme")
    val user = df.select(JwtFunctions.jwtClaims(JwtFunctions.stripBearer($"auth"))
      .getField("cognito:username")).as[String].head()
    assert(user == "alice")
  }

  test("jwt exp claim check: valid, expired, boundary, and missing-exp tokens") {
    def tok(payload: String): String =
      b64url("""{"alg":"RS256","kid":"k1"}""") + "." + b64url(payload) + ".sig"
    val now = 1700000000L
    val cases = Seq(
      (tok(s"""{"sub":"u","exp":"${now + 600}"}"""), false), // still valid
      (tok(s"""{"sub":"u","exp":"${now - 1}"}"""), true),    // past exp
      (tok(s"""{"sub":"u","exp":"$now"}"""), true),          // now == exp → expired (RFC: now must be BEFORE exp)
      (tok("""{"sub":"u"}"""), true),                        // missing exp → fail closed
      (tok("""{"sub":"u","exp":"garbage"}"""), true))        // unparsable → fail closed
    val got = cases.map(_._1).toDF("token")
      .select($"token", JwtFunctions.jwtExpired($"token", lit(now)))
      .as[(String, Boolean)].collect().toMap
    cases.foreach { case (t, want) => assert(got(t) == want, s"token $t") }
  }
}
