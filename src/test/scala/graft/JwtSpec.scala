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
}
