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
