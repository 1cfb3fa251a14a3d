package graft

import graft.extract.{FieldSpec, PayloadExtractor, TableSchemaConfig}
import org.scalatest.funsuite.AnyFunSuite

/** Coercion + overflow semantics of §1.3 extraction, mirroring
  * `/root/reference/src/storage/payload_extractor.rs:36-179` and the unit
  * coverage in `src/contracts/schema.rs:79-161`. */
class PayloadExtractorSpec extends AnyFunSuite {
  private def one(payload: String, fields: FieldSpec*): (Seq[Option[String]], Option[String]) =
    PayloadExtractor.extractOne(TableSchemaConfig(fields = fields), payload)

  test("nested dot-path extraction consumes the key and prunes empty parents") {
    val (vals, overflow) = one("""{"a":{"b":5}}""", FieldSpec("b", "a.b", "Int32"))
    assert(vals === Seq(Some("5")))
    assert(overflow === None) // 'a' became empty and was pruned
  }

  test("overflow keeps unextracted siblings") {
    val (vals, overflow) = one("""{"a":{"b":5,"c":1},"d":2}""", FieldSpec("b", "a.b", "Int32"))
    assert(vals === Seq(Some("5")))
    assert(overflow === Some("""{"a":{"c":1},"d":2}"""))
  }

  test("Int32 is bounds-checked; out-of-range i64 coerces to null but stays in overflow") {
    val (vals, overflow) = one("""{"k":3000000000}""", FieldSpec("k", "k", "Int32"))
    assert(vals === Seq(None))
    assert(overflow === Some("""{"k":3000000000}"""))
    val (v64, o64) = one("""{"k":3000000000}""", FieldSpec("k", "k", "Int64"))
    assert(v64 === Seq(Some("3000000000")))
    assert(o64 === None)
  }

  test("numbers and booleans coerce to Utf8; null resolves to None") {
    assert(one("""{"k":42}""", FieldSpec("k", "k", "Utf8"))._1 === Seq(Some("42")))
    assert(one("""{"k":true}""", FieldSpec("k", "k", "Utf8"))._1 === Seq(Some("true")))
    assert(one("""{"k":null}""", FieldSpec("k", "k", "Utf8"))._1 === Seq(None))
    assert(one("""{"k":1}""", FieldSpec("k", "k", "Boolean"))._1 === Seq(None))
    assert(one("""{"k":1.5}""", FieldSpec("k", "k", "Int32"))._1 === Seq(None))
    assert(one("""{"k":1.5}""", FieldSpec("k", "k", "Float64"))._1 === Seq(Some("1.5")))
    assert(one("""{"k":3}""", FieldSpec("k", "k", "Float64"))._1 === Seq(Some("3.0")))
  }

  test("unparseable payload yields all-null columns and the raw overflow") {
    val (vals, overflow) = one("""not json""", FieldSpec("k", "k", "Int32"))
    assert(vals === Seq(None))
    assert(overflow === Some("not json"))
  }

  test("missing path resolves to null without touching overflow") {
    val (vals, overflow) = one("""{"x":1}""", FieldSpec("k", "a.k", "Int32"))
    assert(vals === Seq(None))
    assert(overflow === Some("""{"x":1}"""))
  }

  test("multiple fields extract independently") {
    val (vals, overflow) = one(
      """{"a":{"b":5},"s":"hi","f":2.25}""",
      FieldSpec("b", "a.b", "Int32"),
      FieldSpec("s", "s", "Utf8"),
      FieldSpec("f", "f", "Float64")
    )
    assert(vals === Seq(Some("5"), Some("hi"), Some("2.25")))
    assert(overflow === None)
  }
}
