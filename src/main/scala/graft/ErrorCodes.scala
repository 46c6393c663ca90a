package graft

/** Stable error codes for the engine's refusal surface — the interpreter
  * counterpart of the reference's append-only code registry
  * (src/lhp/errors/codes.py:511 and categories.py:9, snapshot-tested
  * there): `validate` output stays diffable across engine versions even as
  * message prose improves, and runbooks/CI filters can key on the code.
  *
  * Identity is the (category, number) pair, rendered `GRF-<CAT>-<NNN>`.
  * The registry is flat and append-only: a number is never reused or
  * renumbered, and a retired check keeps its entry (commented) so old
  * logs stay interpretable. Categories mirror the reference's public
  * vocabulary (CFG config shape, ACT per-action contract, VAL flowgroup
  * validation, DEP dependency graph, IO file access, GEN fallback).
  *
  * The code travels IN the message text (`[GRF-CAT-NNN] prose…`), so no
  * exception signature changes and every transport (CLI stderr, Issue
  * lists, logs) carries it for free; [[split]] recovers the structured
  * pair at rendering boundaries. Uncoded errors — the long tail of 150+
  * context-specific refusals — render as [[Uncoded]] rather than forcing
  * a premature taxonomy on them; tag them here as they prove load-bearing.
  */
object ErrorCodes {

  final case class Code(category: String, number: String, summary: String) {
    val code: String = s"GRF-$category-$number"
    /** Tag a message with this code. */
    def apply(msg: String): String = s"[$code] $msg"
  }

  // ---- CFG: config-file shape ------------------------------------------
  val CFG_001 = Code("CFG", "001", "flowgroup document missing 'pipeline'")
  val CFG_002 = Code("CFG", "002", "flowgroup document missing 'flowgroup'")
  val CFG_003 = Code("CFG", "003", "expected exactly one flowgroup document")
  val CFG_040 = Code("CFG", "040", "required_lhp_version gate not satisfied")
  val CFG_050 = Code("CFG", "050", "pipeline_config: continuous mode refused")
  val CFG_051 = Code("CFG", "051", "pipeline_config: cross-pipeline configuration conflict")
  val CFG_052 = Code("CFG", "052", "pipeline_config: malformed entry")

  // ---- ACT: per-action contract ----------------------------------------
  val ACT_001 = Code("ACT", "001", "unknown action type")
  val ACT_002 = Code("ACT", "002", "unknown write_target type")
  val ACT_003 = Code("ACT", "003", "unknown load source type")
  val ACT_010 = Code("ACT", "010", "incremental_join materialized_view contract violated")
  val ACT_011 = Code("ACT", "011", "materialized_view shape not incrementally maintainable")

  // ---- VAL: flowgroup-level validation ---------------------------------
  val VAL_001 = Code("VAL", "001", "ambiguous action targets")
  val VAL_002 = Code("VAL", "002", "flowgroup has no actions")
  val VAL_003 = Code("VAL", "003", "flowgroup has no write action")
  val VAL_004 = Code("VAL", "004", "flowgroup has no load action and no self-contained write")
  val VAL_005 = Code("VAL", "005", "orphan actions (target never consumed)")
  val VAL_006 = Code("VAL", "006", "multiple sinks share one identity")

  // ---- DEP: dependency graphs ------------------------------------------
  val DEP_001 = Code("DEP", "001", "dependency cycle among actions")
  val DEP_002 = Code("DEP", "002", "dependency cycle among flowgroups")

  // ---- IO ---------------------------------------------------------------
  val IO_001 = Code("IO", "001", "project manifest not found / unreadable")

  /** Every registered code — the spec asserts uniqueness and shape. */
  val all: Seq[Code] = Seq(
    CFG_001, CFG_002, CFG_003, CFG_040, CFG_050, CFG_051, CFG_052,
    ACT_001, ACT_002, ACT_003, ACT_010, ACT_011,
    VAL_001, VAL_002, VAL_003, VAL_004, VAL_005, VAL_006,
    DEP_001, DEP_002, IO_001)

  /** Rendered for errors no registry entry tags (yet). */
  val Uncoded = "GRF-GEN-000"

  private val Tagged = "(?s)^\\[(GRF-[A-Z]+-[0-9A-Z]+)\\]\\s(.*)$".r

  /** (code, bare message) — [[Uncoded]] when the message carries no tag.
    * Null-safe: validation feeds arbitrary caught Throwables through here,
    * and an exception constructed without a message must degrade to an
    * Uncoded issue, not NPE the whole validate run. */
  def split(msg: String): (String, String) = msg match {
    case null => (Uncoded, "(no message)")
    case Tagged(c, rest) => (c, rest)
    case m => (Uncoded, m)
  }
}
