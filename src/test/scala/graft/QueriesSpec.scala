package graft

/** Smoke: every registered query executes at sf0.001 and every oracle
  * key refers to a registered query (column-name parity with the oracle
  * is covered by tools/oracle_check.py against DuckDB at sf0.01). */
class QueriesSpec extends SparkSpec {

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("Bench.evalAll forces all columns and survives ANSI mode on any schema") {
    import spark.implicits._
    // full-range longs (a + fold would overflow under ANSI), arrays,
    // and a map column (unhashable — takes the to_json path)
    val df = Seq(
      (Long.MaxValue, Seq(1.5f, -2.5f), Map("a" -> 1L)),
      (Long.MinValue, Seq(0.0f), Map("b" -> 2L)),
      (0L, Seq.empty[Float], Map.empty[String, Long])
    ).toDF("id", "vec", "m")
    assert(Bench.evalAll(df) == 3L)
    // and on a real query result with doubles/strings/timestamps
    assert(Bench.evalAll(
      SparkEntry.queries("w6_group_aggregates")(spark, sf0001)) > 0L)
  }

  test("no duplicate query keys across or within the query files") {
    // Map literals and ++ both swallow duplicate keys silently — a new
    // query reusing an existing name would SHADOW the old one and its
    // oracle (caught here, not at the driver's gate where the survivor
    // still passes). Cross-map: sizes must add up. Within-file: count
    // the `"name" -> ((s, d)` registration sites in source.
    val maps = Seq(
      graft.queries.ParityQueries.queries,
      graft.queries.ExtensionQueries.queries,
      graft.queries.TrainingQueries.queries)
    assert(maps.map(_.size).sum == SparkEntry.queries.size,
      "a query key is registered in more than one queries file")
    val reg = """"([a-z0-9_]+)" -> \(\(s, [d_]\)""".r
    val files = Seq("ParityQueries", "ExtensionQueries", "TrainingQueries")
      .map(f => s"src/main/scala/graft/queries/$f.scala")
    val names = files.flatMap { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try reg.findAllMatchIn(src.mkString).map(_.group(1)).toList
      finally src.close()
    }
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query registrations: $dups")
    assert(names.size == SparkEntry.queries.size,
      "registration-site count and merged map size disagree")
  }

  test("every query is documented in OPERATORS.md (doc-rot guard)") {
    val docs = {
      val src = scala.io.Source.fromFile("OPERATORS.md", "UTF-8")
      try src.mkString finally src.close()
    }
    // anchored on the backticked code span a doc row uses — bare
    // substring containment would be satisfied by prose mentions or a
    // longer name containing this one
    val missing = SparkEntry.queries.keySet
      .filterNot(n => docs.contains(s"`$n`"))
    assert(missing.isEmpty, s"queries missing from OPERATORS.md: $missing")
    // the Totals line is DERIVED state — hand-maintained counts rotted
    // once (r5 verdict: the line said 154/147 against an actual
    // 188/181 while every per-query row was present). Parse it and
    // pin it to the code: total = queries.size, oracled =
    // oracleSql.size, rows-only = the difference.
    val totals = """\*\*Totals: (\d+) queries — (\d+) DuckDB-oracled, (\d+) rows-only""".r
    totals.findFirstMatchIn(docs) match {
      case Some(m) =>
        val (t, o, r) = (m.group(1).toInt, m.group(2).toInt, m.group(3).toInt)
        assert(t == SparkEntry.queries.size && o == SparkEntry.oracleSql.size
            && r == SparkEntry.queries.size - SparkEntry.oracleSql.size,
          s"OPERATORS.md Totals line says $t/$o/$r but the code has " +
            s"${SparkEntry.queries.size}/${SparkEntry.oracleSql.size}/" +
            s"${SparkEntry.queries.size - SparkEntry.oracleSql.size} — " +
            "update the line (it must state queries.size, oracleSql.size " +
            "and their difference)")
      case None =>
        fail("OPERATORS.md Totals line missing or no longer matches " +
          "'**Totals: N queries — M DuckDB-oracled, K rows-only'")
    }
    // README.md carries the same derived counts — same rot risk, same pin
    val readme = {
      val src = scala.io.Source.fromFile("README.md", "UTF-8")
      try src.mkString finally src.close()
    }
    val rm = """\((\d+) queries, (\d+) oracled""".r
    rm.findFirstMatchIn(readme) match {
      case Some(m) =>
        assert(m.group(1).toInt == SparkEntry.queries.size
            && m.group(2).toInt == SparkEntry.oracleSql.size,
          s"README.md says ${m.group(1)}/${m.group(2)} queries/oracled " +
            s"but the code has ${SparkEntry.queries.size}/" +
            s"${SparkEntry.oracleSql.size}")
      case None => fail("README.md '(N queries, M oracled' line missing")
    }
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      // the w24 list policy, made un-rottable (checked here so eager
      // builders — convergence loops, binary searches, local collects —
      // run ONCE per query, not twice): the driver's comparator
      // materializes both sides as pandas frames and sort_values over
      // every column — an ARRAY cell crashes it ("unhashable type:
      // numpy.ndarray", e5/e6/e12b/e14b round 6) regardless of whether
      // values match, and a STRUCT lands as an unhashable dict cell in
      // the same class. Top-level suffices: any nested container sits
      // inside a top-level Array/Map/Struct, which is itself flagged.
      // Lists must ship stringified (array_join/array_to_string).
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      if (SparkEntry.oracleSql.contains(name)) {
        val offenders = df.schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType]
                 || f.dataType.isInstanceOf[MapType]
                 || f.dataType.isInstanceOf[StructType] =>
            s"${f.name}: ${f.dataType.simpleString}"
        }
        assert(offenders.isEmpty,
          s"array/map/struct-typed columns reach the driver comparator " +
            s"(stringify per the w24 list policy): ${offenders.toSeq}")
      }
      df.count() // must not throw
    }
  }
}
