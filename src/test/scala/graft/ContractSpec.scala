package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: these invariants are what the harness
  * assumes; breaking any of them would silently weaken the correctness
  * gate rather than fail loudly.
  */
class ContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("every oracle key references a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every registered query has an oracle (sketches live outside the map)") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"unexpected rows-only queries: $unoracled")
  }

  test("query names are driver-safe identifiers") {
    SparkEntry.queries.keys.foreach(k => assert(k.matches("[a-z0-9_]+"), k))
  }

  test("query functions are pure: two invocations give identical schemas") {
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("flagship_location_summary", "q01_dim_decode_join", "d03_lsh_candidates")) {
      val fn = SparkEntry.queries(name)
      assert(fn(spark, dir).schema == fn(spark, dir).schema)
    }
  }

  // The correctness harness canonicalizes result rows by pandas-sorting
  // every output column; array/map/struct cells are unhashable/unsortable
  // there, so a query emitting them is silently UNVERIFIED (r8's t22).
  // Struct columns count too (r9 ADVICE): a struct is itself unsortable
  // AND is the only place a nested array/map could hide — so rejecting
  // every container type at the top level covers all nesting depths.
  // Forbid the shape: flatten (inline/explode) or join to strings before
  // returning.
  test("no registered query emits array/map/struct output columns at any depth") {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def nonAtomic(dt: DataType): Boolean = dt match {
      case _: ArrayType | _: MapType | _: StructType => true
      case _ => false
    }
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val bad = fn(spark, dir).schema.fields.collect {
        case f if nonAtomic(f.dataType) => f.name
      }
      if (bad.isEmpty) None else Some(s"$name(${bad.mkString(",")})")
    }
    assert(offenders.isEmpty,
      s"comparator-unsafe output schemas: ${offenders.mkString("; ")}")
  }
}
