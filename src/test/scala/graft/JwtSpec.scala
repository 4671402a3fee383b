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

  test("RS256 signature verification: good, tampered, wrong-key, expired, unknown-kid all fail closed") {
    import graft.functions.JwtVerify
    val b64e = java.util.Base64.getUrlEncoder.withoutPadding()
    def enc(s: String) = b64e.encodeToString(s.getBytes("UTF-8"))
    val gen = java.security.KeyPairGenerator.getInstance("RSA")
    gen.initialize(2048)
    val pair = gen.generateKeyPair()
    val otherPair = gen.generateKeyPair()
    val pub = pair.getPublic.asInstanceOf[java.security.interfaces.RSAPublicKey]
    def sign(h: String, p: String, k: java.security.PrivateKey): String = {
      val body = s"${enc(h)}.${enc(p)}"
      val sig = java.security.Signature.getInstance("SHA256withRSA")
      sig.initSign(k)
      sig.update(body.getBytes("UTF-8"))
      s"$body.${b64e.encodeToString(sig.sign())}"
    }
    val now = 1700000000L
    val header = """{"alg":"RS256","kid":"k1"}"""
    val payload = s"""{"sub":"u","custom:tenantId":"acme","exp":"${now + 600}"}"""
    val good = sign(header, payload, pair.getPrivate)
    val keys = Map("k1" -> pub)

    // the JWK (n,e) round-trip reconstructs the same key material
    val jwkKey = JwtVerify.rsaKeyFromJwk(
      b64e.encodeToString(pub.getModulus.toByteArray),
      b64e.encodeToString(pub.getPublicExponent.toByteArray))
    assert(jwkKey.getModulus == pub.getModulus)

    assert(JwtVerify.keyId(good).contains("k1"))
    assert(JwtVerify.verifyRs256(good, pub))
    assert(JwtVerify.verifyRs256(good, jwkKey), "JWK-built key must verify too")
    assert(JwtVerify.authorize(good, keys, now))

    // tampered payload (tenant swap) → signature fails
    val Array(h, _, s) = good.split('.')
    val tampered = s"$h.${enc(payload.replace("acme", "evil"))}.$s"
    assert(!JwtVerify.verifyRs256(tampered, pub))
    assert(!JwtVerify.authorize(tampered, keys, now))
    // wrong key / unknown kid / expired / alg=none / malformed → deny
    assert(!JwtVerify.verifyRs256(good,
      otherPair.getPublic.asInstanceOf[java.security.interfaces.RSAPublicKey]))
    assert(!JwtVerify.authorize(good, Map("other" -> pub), now))
    assert(!JwtVerify.authorize(
      sign(header, s"""{"sub":"u","exp":"${now - 1}"}""", pair.getPrivate), keys, now))
    val noneAlg = s"${enc("""{"alg":"none","kid":"k1"}""")}.${enc(payload)}."
    assert(!JwtVerify.verifyRs256(noneAlg, pub))
    assert(!JwtVerify.authorize("not-a-jwt", keys, now))

    // exp must come from the TOP-LEVEL claim, not an "exp"-shaped
    // substring inside another claim's string value: a legitimately
    // signed token with a decoy must be judged by its real exp only
    val decoyUnexpired = sign(header,
      s"""{"sub":"u","note":"ignore \\"exp\\":\\"${now + 9999}\\" here","exp":"${now - 1}"}""",
      pair.getPrivate)
    assert(!JwtVerify.authorize(decoyUnexpired, keys, now),
      "an expired token must not be revived by a decoy exp in a string claim")
    val decoyExpired = sign(header,
      s"""{"sub":"u","note":"ignore \\"exp\\":\\"1\\" here","exp":"${now + 600}"}""",
      pair.getPrivate)
    assert(JwtVerify.authorize(decoyExpired, keys, now),
      "a valid token must not be denied by a decoy exp in a string claim")
    // numeric (unquoted) exp — the RFC shape — is accepted too
    assert(JwtVerify.authorize(
      sign(header, s"""{"sub":"u","exp":${now + 600}}""", pair.getPrivate), keys, now))
  }
}
