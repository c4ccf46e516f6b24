package graft

import org.apache.spark.sql.types.{ArrayType, MapType}

/** Registry-wide gate-output shape rule: NO gate query may emit a
  * top-level ArrayType (or MapType) column. The driver's oracle harness
  * canonicalizes row order with pandas `sort_values` over all columns
  * and crashes on list values ("unhashable type: numpy.ndarray") — the
  * round-11 e07/e09/t21 failure mode. Array-valued results must be
  * posexploded to scalar (id, idx, component) rows before they leave a
  * gate (the array can stay internal to the operator).
  *
  * Building every gate frame at sf0.001 also smoke-checks that each
  * query body constructs and analyzes cleanly.
  */
class GateShapeSpec extends SparkSpec {

  test("no gate emits a top-level ArrayType/MapType column") {
    val dir = sf()
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, mk) =>
        val schema = mk(spark, dir).schema
        val bad = schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType]
            || f.dataType.isInstanceOf[MapType] => s"$name.${f.name}"
        }
        bad
    }
    assert(offenders.isEmpty,
      s"gates emit unsortable top-level columns: ${offenders.mkString(", ")}")
  }
}
