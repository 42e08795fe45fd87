package graft.functions

import graft.SparkSpec

/** H3 table-free subset, anchored to values from the reference's own
  * stateless tests (01040/01041/01043/01070/02021/02155/02165/02212 —
  * the golden suite runs the full files; this spec pins the kernel
  * directly so a golden-harness change can't mask a kernel break). */
class H3Spec extends SparkSpec {

  test("resolution / base cell / validity bits") {
    assert(H3Core.resolution(581276613233082367L) == 1)
    assert(H3Core.resolution(621807531097128959L) == 10)
    assert(H3Core.resolution(644325529233966508L) == 15)
    assert(H3Core.baseCell(612916788725809151L) == 12)
    assert(H3Core.isValid(581276613233082367L))
    assert(H3Core.isValid(621807531097128959L))
    assert(!H3Core.isValid(0L))
    assert(!H3Core.isValid(100000000000000000L))
  }

  test("parent / center child / children") {
    assert(H3Core.toParent(599405990164561919L, 3) == 590398848891879423L)
    assert(H3Core.toParent(599405990164561919L, 0) == 576918149140578303L)
    // 02155 fixtures: res-0 cell 15's center child at res 1 and 15
    assert(H3Core.toCenterChild(577023702256844799L, 1) ==
      581496515558637567L)
    assert(H3Core.toCenterChild(577023702256844799L, 15) ==
      644542512295313408L)
    // children: coarser target → empty; +1 res → 7 (hexagon)
    assert(H3Core.toChildren(599405990164561919L, 3).isEmpty)
    val c6 = H3Core.toChildren(599405990164561919L, 6)
    assert(c6.length == 7)
    assert(c6.sorted.head == 603909588852408319L)
    assert(H3Core.toChildren(599405990164561919L, 8).length == 343)
    // pentagon children skip the K axis: 6 instead of 7
    val pent0 = H3Core.res0Indexes()(4)
    assert(H3Core.isPentagon(pent0))
    assert(H3Core.toChildren(pent0, 1).length == 6)
    // res-2 descendants of a pentagon: center child is again a pentagon
    // (6 children), the 5 hexagon children have 7 each → 6 + 5·7 = 41
    assert(H3Core.toChildren(pent0, 2).length == 41)
  }

  test("string round trip and sscanf-style parse") {
    assert(H3Core.toHexString(617420388352917503L) == "89184926cdbffff")
    assert(H3Core.parseHex("89184926cc3ffff") == 617420388351344639L)
    // 02021: 0x-prefixed with trailing junk parses like sscanf %llx
    assert(H3Core.parseHex("0x8f28308280f18f2L") ==
      H3Core.parseHex("8f28308280f18f2"))
  }

  test("pentagon predicates and enumerations") {
    assert(H3Core.isPentagon(H3Core.parseHex("8f28308280f18f2")) == false)
    assert(H3Core.isPentagon(H3Core.parseHex("821c07fffffffff")))
    assert(H3Core.isResClassIII(581276613233082367L)) // res 1
    assert(!H3Core.isResClassIII(621807531097128959L)) // res 10
    val res0 = H3Core.res0Indexes()
    assert(res0.length == 122)
    assert(res0.head == 576495936675512319L)
    assert(res0.last == 580753245698260991L)
    val pent0 = H3Core.pentagonIndexes(0)
    assert(pent0.head == 576636674163867647L)
    assert(pent0.last == 580612508209905663L)
    val pent15 = H3Core.pentagonIndexes(15)
    assert(pent15.head == 644155484202336256L)
    assert(pent15.last == 648131318248374272L)
  }

  test("constant tables and distances") {
    assert(H3Core.EdgeLengthM(1) == 418676.0055)
    assert(H3Core.EdgeLengthM(4) == 22606.3794)
    assert(H3Core.edgeAngle(10) == 0.0005927224846720883)
    // the identity the reference asserts in 01044
    assert(H3Core.EdgeLengthM(2) * 180 / math.Pi / 6371007.180918475 -
      H3Core.edgeAngle(2) == 0.0)
    assert(H3Core.HexAreaM2(5) == 252903364.5)
    assert(H3Core.HexAreaM2(13) == 43.9)
    assert(H3Core.numHexagons(0) == 122L)
    assert(H3Core.numHexagons(15) == 569707381193162L)
    // 02212_h3_point_dist: 20° along a meridian
    assert(math.abs(H3Core.pointDistRads(-10, 0, 10, 0) - 0.34907) < 5e-6)
    assert(math.abs(H3Core.pointDistRads(-10, 0, 10, 0) *
      H3Core.EarthRadiusM - 2223901.04) < 0.01)
    intercept[IllegalArgumentException](H3Core.numHexagons(16))
    intercept[IllegalArgumentException](H3Core.toParent(1L, 100))
  }

  test("SQL surface registers and computes") {
    val df = graft.ChSql.sql(spark,
      "SELECT h3GetResolution(599405990164561919), " +
        "h3ToParent(599405990164561919, 3), " +
        "h3ToString(617420388352917503), " +
        "stringToH3('89184926cc3ffff'), " +
        "h3IsPentagon(stringToH3('821c07fffffffff')), " +
        "h3NumHexagons(10)", graft.SparkSpec.tiny)
    val r = df.collect()(0)
    assert(r.get(0) == 5)
    assert(r.get(1) == 590398848891879423L)
    assert(r.get(2).toString == "89184926cdbffff")
    assert(r.get(3) == 617420388351344639L)
    assert(r.get(4) == true)
    assert(r.get(5) == 33897029882L)
  }

  test("excluded projection subset fails with a precise diagnostic") {
    for (call <- Seq("geoToH3(37.79506683, 55.71290588, 15)",
      "h3ToGeo(644325524701193974)", "h3kRing(644325529094369568, 1)",
      "h3Distance(599686042433355775, 599686023506952191)")) {
      val e = intercept[Exception] {
        graft.ChSql.sql(spark, s"SELECT $call", graft.SparkSpec.tiny)
          .collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("base-cell projection tables")),
        s"unexpected error for $call: $e")
    }
  }
}
