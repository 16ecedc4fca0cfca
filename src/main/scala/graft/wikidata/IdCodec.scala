package graft.wikidata

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense u32 ID codec as pure Column expressions (codegen-friendly — no
  * UDFs, so the codec inlines into whole-stage codegen at scan time).
  *
  * Mirrors the reference's numeric layout
  * (/root/reference/wikidata-rs/src/id.rs:70-88):
  *   Qid(n) -> n
  *   Pid(n) -> n + 1e9
  *   Lid(n) -> n + 2e9
  *   Fid(l,k) -> (l + 2e9) + (k + 3e9)   wrapping u32
  *   Sid(l,k) -> (l + 2e9) + (k + 3e9) + 5e8   wrapping u32
  *   DataType -> tag + 4e9  (id.rs:85, dtype.rs:58-68)
  * Values are u32; Spark stores them in BIGINT (no unsigned 32-bit type).
  *
  * Accepted string forms: the dump's ("Q42", "P31", "L7", "L7-F2",
  * "L7-S3") and the reference's own ("F7-F2", "S7-S3", "@String";
  * id.rs:28-59).
  */
object IdCodec {

  private val U32: Long = 4294967296L

  val PidOffset = 1000000000L
  val LidOffset = 2000000000L
  val DTypeOffset = 4000000000L
  // Lid offset + the 3e9 form/sense offset, pre-combined.
  private val FidBase = 5000000000L
  private val SidBase = 5500000000L

  private def num(id: Column, re: String, group: Int = 1): Column =
    regexp_extract(id, re, group).cast("long")

  /** Entity-id string -> dense u32 (null for unrecognized forms, as the
    * reference skips lines it cannot parse). */
  def idToU32(id: Column): Column =
    when(id.rlike("^Q\\d+$"), num(id, "^Q(\\d+)$"))
      .when(id.rlike("^P\\d+$"), num(id, "^P(\\d+)$") + PidOffset)
      .when(id.rlike("^L\\d+$"), num(id, "^L(\\d+)$") + LidOffset)
      .when(
        id.rlike("^[LF]\\d+-F\\d+$"),
        pmod(num(id, "^[LF](\\d+)-F(\\d+)$") + num(id, "^[LF](\\d+)-F(\\d+)$", 2) + FidBase, lit(U32)))
      .when(
        id.rlike("^[LS]\\d+-S\\d+$"),
        pmod(num(id, "^[LS](\\d+)-S(\\d+)$") + num(id, "^[LS](\\d+)-S(\\d+)$", 2) + SidBase, lit(U32)))
      .when(id === "@Quantity", lit(DTypeOffset + 1))
      .when(id === "@Coordinate", lit(DTypeOffset + 2))
      .when(id === "@String", lit(DTypeOffset + 3))
      .when(id === "@DateTime", lit(DTypeOffset + 4))
      .when(id === "@Entity", lit(DTypeOffset + 5))
      .otherwise(lit(null).cast("long"))

  /** Quantity-unit / globe URI -> Qid u32. The dump encodes units as
    * entity URIs ("http://www.wikidata.org/entity/Q4917") or the literal
    * "1" for dimensionless (-> null, value.rs:403-413). */
  def qidFromUri(uri: Column): Column =
    when(uri.isNull || uri === "1", lit(null).cast("long"))
      .when(uri.rlike("Q\\d+$"), regexp_extract(uri, "Q(\\d+)$", 1).cast("long"))
      .otherwise(lit(null).cast("long"))
}
