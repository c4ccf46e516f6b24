package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Registry-wide gate-output shape rule: NO gate query may emit a
  * top-level ArrayType, MapType, or StructType column. The driver's
  * oracle harness canonicalizes row order with pandas `sort_values`
  * over all columns and crashes on list values ("unhashable type:
  * numpy.ndarray") — the round-11 e07/e09/t21 failure mode — and
  * struct values are equally unsortable. Nested results must be
  * posexploded / field-selected to scalar rows before they leave a
  * gate (the nested type can stay internal to the operator).
  *
  * This offender match is kept in lockstep with `tools/check.py`'s
  * ARRAY-OUTPUT prefix tuple (list/large_list/fixed_size_list/struct/
  * map) so the two enforcement points agree — a shape that passes the
  * local spec must not ship driver-red.
  *
  * Building every gate frame at sf0.001 also smoke-checks that each
  * query body constructs and analyzes cleanly.
  */
class GateShapeSpec extends SparkSpec {

  test("no gate emits a top-level ArrayType/MapType/StructType column") {
    val dir = sf()
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, mk) =>
        val schema = mk(spark, dir).schema
        val bad = schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType]
            || f.dataType.isInstanceOf[MapType]
            || f.dataType.isInstanceOf[StructType] => s"$name.${f.name}"
        }
        bad
    }
    assert(offenders.isEmpty,
      s"gates emit unsortable top-level columns: ${offenders.mkString(", ")}")
  }
}
