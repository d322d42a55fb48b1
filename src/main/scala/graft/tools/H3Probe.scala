package graft.tools

import graft.functions.H3

/** Dev probe: validates the H3 implementation against values pinned by the
  * reference corpus golden file (tests/cases/standalone/common/function/geo.result).
  */
object H3Probe {
  def main(args: Array[String]): Unit = {
    def check[A](name: String, got: A, want: A): Unit = {
      val ok = got == want
      println(f"${if (ok) "OK  " else "FAIL"} $name%-28s got=$got${if (ok) "" else s" want=$want"}")
    }

    check("latlng_to_cell res0", H3.latLngToCell(37.76938, -122.3889, 0), 577199624117288959L)
    check("latlng_to_cell res1", H3.latLngToCell(37.76938, -122.3889, 1), 581672437419081727L)
    check("latlng_to_cell res8", H3.latLngToCell(37.76938, -122.3889, 8), 613196570438926335L)
    val cell8 = 613196570438926335L
    check("cell_to_string", H3.cellToString(cell8), "88283082e7fffff")
    check("string_to_cell", H3.stringToCell("88283082e7fffff"), cell8)
    check("center", H3.cellToLatLng(cell8), (37.77246152245501, -122.39010997087324))
    check("resolution", H3.resolution(cell8), 8)
    check("base", H3.baseCellNumber(cell8), 20)
    check("pentagon", H3.isPentagon(cell8), false)
    check("parent6", H3.parent(cell8, 6), 604189371209351167L)
    val kids = H3.children(cell8, 10)
    check("children_head", kids.head, 622203769691602943L)
    check("children_last", kids.last, 622203769693372415L)
    check("children_count", kids.length, 49)
    check("children_size", H3.childrenSize(cell8, 10), 49L)
    check("child_pos", H3.cellToChildPos(cell8, 6), 45L)
    check("child_at", H3.childPosToCell(25, cell8, 11), 626707369319059455L)

    val disk3 = H3.gridDisk(cell8, 3)
    val wantDisk = Array(613196570438926335L, 613196570436829183L, 613196569755254783L,
      613196570378108927L, 613196570373914623L, 613196570434732031L, 613196570432634879L,
      613196570445217791L, 613196570250182655L, 613196569753157631L, 613196569744769023L,
      613196569746866175L, 613196570369720319L, 613196570365526015L, 613196570376011775L,
      613196570336165887L, 613196570344554495L, 613196570443120639L, 613196570441023487L,
      613196570220822527L, 613196570258571263L, 613196570248085503L, 613196570254376959L,
      613196569757351935L, 613196569748963327L, 613196569751060479L, 613196569686048767L,
      613196569688145919L, 613196570371817471L, 613196570367623167L, 613196570394886143L,
      613196570338263039L, 613196570331971583L, 613196570340360191L, 613196570405371903L,
      613196570403274751L, 613196570216628223L)
    check("disk0", H3.gridDisk(cell8, 0).toSeq, Seq(cell8))
    check("disk3_size", disk3.length, wantDisk.length)
    check("disk3_set", disk3.toSet == wantDisk.toSet, true)
    check("disk3_order", disk3.toSeq, wantDisk.toSeq)

    val c1 = H3.stringToCell("86283082fffffff")
    val c2 = H3.stringToCell("86283470fffffff")
    check("grid_distance", H3.gridDistance(c1, c2), 9)
    val wantPath = Seq(604189371209351167L, 604189371075133439L, 604189375235883007L,
      604189375101665279L, 604189638034194431L, 604189638571065343L, 604189638436847615L,
      604189642597597183L, 604189642463379455L, 604189641255419903L)
    check("grid_path", H3.gridPathCells(c1, c2).toSeq, wantPath)
    check("sphere_km", math.rint(H3.distanceSphereKm(c1, c2) * 100000) / 100000, 55.05017)
    check("degree", math.rint(H3.distanceDegree(c1, c2) * 1e14) / 1e14, 0.54939243697098)

    val set = Seq("86283470fffffff", "862834777ffffff", "862834757ffffff", "86283471fffffff",
      "862834707ffffff").map(H3.stringToCell)
    check("contains1", H3.cellsContains(set, H3.stringToCell("8b283470d112fff")), true)
    check("contains2", H3.cellsContains(set, 604189641792290815L), false)
    check("contains3", H3.cellsContains(set, 626707639343067135L), true)

    println("running selfCheck (exhaustive res-1/2 round-trips)...")
    H3.selfCheck()
    println("selfCheck passed")
  }
}
