package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JWT claim extraction (SURVEY §2.4 C1): the reference's authorizer reads
  * `custom:tenantId` and `cognito:username` from the token payload
  * (lambda_authorizer/app.py:20-21,81-85). Claim→tenant propagation is in
  * engine scope; SIGNATURE VERIFICATION IS NOT (auth infra, out of scope
  * per SURVEY §2.4) — these functions parse, they do not authenticate.
  *
  * A JWT is header.payload.signature with base64url segments; the payload
  * is a JSON object. Pure column expressions: split → base64url-decode →
  * from_json.
  */
object JwtFunctions {

  val claimsSchema: StructType = StructType(Seq(
    StructField("sub", StringType),
    StructField("custom:tenantId", StringType),
    StructField("cognito:username", StringType),
    StructField("exp", StringType)))

  /** base64url → standard base64 (replace chars; unbase64 is lenient on
    * missing padding). */
  private def b64urlDecode(c: Column): Column =
    unbase64(translate(c, "-_", "+/")).cast("string")

  /** Parsed claims struct from a `Bearer `-stripped JWT string. */
  def jwtClaims(token: Column): Column =
    from_json(b64urlDecode(split(token, "\\.").getItem(1)), claimsSchema)

  /** The tenant claim — the server-side tenant source of C3. */
  def jwtTenantId(token: Column): Column =
    jwtClaims(token).getField("custom:tenantId")

  /** Strip an Authorization header to the raw token (app.py:13-18). */
  def stripBearer(header: Column): Column =
    regexp_replace(header, "^Bearer ", "")

  /** The `exp` claim as epoch seconds (null if absent/non-numeric —
    * try_cast, because an ANSI cast would fail the whole query on one
    * malformed token). */
  def jwtExp(token: Column): Column =
    jwtClaims(token).getField("exp").try_cast("long")

  /** Claim-level expiry check, parity with the authorizer's exp validation
    * (lambda_authorizer/app.py: deny when the token is past `exp`). RFC
    * 7519 §4.1.4: valid iff now < exp. FAIL-CLOSED: a missing or
    * unparsable `exp` counts as expired, like the authorizer's
    * deny-by-default. No signature crypto (out of scope per SURVEY §2.4). */
  def jwtExpired(token: Column, nowEpochSeconds: Column): Column =
    coalesce(jwtExp(token) <= nowEpochSeconds, lit(true))
}

/** RS256 signature verification — the request-level half of the
  * reference's authorizer (lambda_authorizer/app.py:50-59: JWKS lookup by
  * `kid`, RS256 check, deny on failure). The authorizer verifies ONE
  * token per request, so this is deliberately a plain JVM API, not a
  * per-row column expression: the control plane calls it once and then
  * runs `TenantQueries` under the verified tenant. Only the JWKS FETCH
  * (network) stays out of scope — verification against supplied keys is
  * pure JDK crypto. Every path FAILS CLOSED: malformed token, unknown
  * kid, wrong alg, bad signature, or expired → deny. */
object JwtVerify {
  import java.security.interfaces.RSAPublicKey

  private val b64 = java.util.Base64.getUrlDecoder

  /** Build an RSAPublicKey from a JWK's base64url `n`/`e` members — the
    * shape a JWKS document carries per key id. */
  def rsaKeyFromJwk(nB64Url: String, eB64Url: String): RSAPublicKey = {
    val n = new java.math.BigInteger(1, b64.decode(nB64Url))
    val e = new java.math.BigInteger(1, b64.decode(eB64Url))
    java.security.KeyFactory.getInstance("RSA")
      .generatePublic(new java.security.spec.RSAPublicKeySpec(n, e))
      .asInstanceOf[RSAPublicKey]
  }

  private def headerJson(token: String): Option[String] =
    token.split('.') match {
      case Array(h, _, _) =>
        try Some(new String(b64.decode(h), "UTF-8")) catch { case _: Exception => None }
      case _ => None
    }

  /** `kid` from the token header (None on any malformation). The tiny
    * regex avoids a JSON dependency for a two-field header. */
  def keyId(token: String): Option[String] =
    headerJson(token).flatMap(j =>
      "\"kid\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(j).map(_.group(1)))

  private def alg(token: String): Option[String] =
    headerJson(token).flatMap(j =>
      "\"alg\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(j).map(_.group(1)))

  /** SHA256withRSA over `header.payload` against the token's signature.
    * False (never a throw) on any malformation. */
  def verifyRs256(token: String, key: RSAPublicKey): Boolean =
    token.split('.') match {
      case Array(h, p, s) if alg(token).contains("RS256") =>
        try {
          val sig = java.security.Signature.getInstance("SHA256withRSA")
          sig.initVerify(key)
          sig.update(s"$h.$p".getBytes("UTF-8"))
          sig.verify(b64.decode(s))
        } catch { case _: Exception => false }
      case _ => false
    }

  /** Top-level `exp` from the payload via a REAL JSON parse (Jackson, on
    * the Spark classpath) — a regex over the raw payload text can match an
    * "exp"-shaped substring embedded in ANOTHER claim's string value
    * (escaped quotes still leave '"exp":"123"' in the raw text), driving
    * expiry from the wrong field: a legitimately-signed token could be
    * wrongly accepted as unexpired, or wrongly denied. The reference
    * authorizer parses claims structurally; so does this. Accepts a JSON
    * number or a numeric string; anything else fails closed. */
  private def topLevelExp(payloadJson: String): Option[Long] =
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(payloadJson)
      Option(node.get("exp")).flatMap { e =>
        if (e.isNumber) Some(e.longValue())
        else if (e.isTextual) e.asText().toLongOption
        else None
      }
    } catch { case _: Exception => None }

  /** The token's top-level `custom:tenantId` claim (the reference
    * authorizer's tenant source, lambda_authorizer/app.py:20-21,81-85) —
    * JVM-side twin of the column-level `JwtFunctions.jwtTenantId`, for
    * the request path. None on any malformation; callers fail closed.
    * NOTE: parses WITHOUT verifying — use after [[authorize]]. */
  def tenantClaim(token: String): Option[String] =
    token.split('.') match {
      case Array(_, p, _) =>
        try {
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(new String(b64.decode(p), "UTF-8"))
          Option(node.get("custom:tenantId")).filter(_.isTextual).map(_.asText())
            .filter(_.nonEmpty)
        } catch { case _: Exception => None }
      case _ => None
    }

  /** Full authorizer parity minus the network fetch: kid → key lookup,
    * RS256 signature check, expiry check. */
  def authorize(token: String, keys: Map[String, RSAPublicKey],
                nowEpochSeconds: Long): Boolean = {
    val expOk = token.split('.') match {
      case Array(_, p, _) =>
        try topLevelExp(new String(b64.decode(p), "UTF-8"))
          .exists(_ > nowEpochSeconds)
        catch { case _: Exception => false }
      case _ => false
    }
    expOk && keyId(token).flatMap(keys.get).exists(verifyRs256(token, _))
  }

  /** Serialize a key map as a standard JWKS document
    * (`{"keys":[{"kty":"RSA","kid":...,"n":...,"e":...}]}`) — the
    * rotation tooling's writer half of [[JwksFileSource]]. */
  def toJwksJson(keys: Map[String, RSAPublicKey]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    val arr = root.putArray("keys")
    val enc = java.util.Base64.getUrlEncoder.withoutPadding()
    def unsigned(b: java.math.BigInteger): Array[Byte] = {
      val raw = b.toByteArray
      if (raw.length > 1 && raw(0) == 0) raw.drop(1) else raw
    }
    keys.toSeq.sortBy(_._1).foreach { case (kid, k) =>
      val n = arr.addObject()
      n.put("kty", "RSA")
      n.put("kid", kid)
      n.put("n", enc.encodeToString(unsigned(k.getModulus)))
      n.put("e", enc.encodeToString(unsigned(k.getPublicExponent)))
    }
    mapper.writeValueAsString(root)
  }
}

/** File-based JWKS source with mtime-triggered RELOAD — closes the last
  * sliver of the reference authorizer's C1 without a network: where
  * `lambda_authorizer/app.py:24-36` fetches the JWKS document over HTTPS
  * and matches `kid` per token, this watches a local JWKS file (in a real
  * deployment: a secrets-manager mount or config-map projection) and
  * re-parses it when its mtime changes. Key ROTATION therefore needs no
  * server restart: tokens under a retired kid start missing the lookup
  * (deny — fail closed), tokens under the new kid verify as soon as the
  * file lands. A missing or malformed file yields an EMPTY key set —
  * every token denied, never an exception on the request path. */
final class JwksFileSource(path: String)
    extends (() => Map[String, java.security.interfaces.RSAPublicKey]) {
  import java.security.interfaces.RSAPublicKey

  @volatile private var state: (Long, Map[String, RSAPublicKey]) =
    (Long.MinValue, Map.empty)

  def apply(): Map[String, RSAPublicKey] = {
    val f = new java.io.File(path)
    val mtime = f.lastModified() // 0 when missing — also a state change
    if (mtime != state._1) synchronized {
      if (mtime != state._1) state = (mtime, parse(f))
    }
    state._2
  }

  private def parse(f: java.io.File): Map[String, RSAPublicKey] =
    if (!f.isFile) Map.empty
    else try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
      val keys = Option(node.get("keys")).toSeq.flatMap { arr =>
        (0 until arr.size()).flatMap { i =>
          val k = arr.get(i)
          for {
            kid <- Option(k.get("kid")).filter(_.isTextual).map(_.asText())
            n <- Option(k.get("n")).filter(_.isTextual).map(_.asText())
            e <- Option(k.get("e")).filter(_.isTextual).map(_.asText())
            if Option(k.get("kty")).forall(_.asText() == "RSA")
          } yield kid -> JwtVerify.rsaKeyFromJwk(n, e)
        }
      }
      keys.toMap
    } catch { case _: Exception => Map.empty } // malformed → deny-all
}
