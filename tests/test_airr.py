"""S13 AIRR KG tests mirroring reference test/output/in_memory/test_airr.py
(fixtures from test/fixtures/data_generator.py:150-333)."""

import pytest

from biocypher_spark.airr import AirrKG

TRA = [
    ("tra:CAVRWGGKLSF", "tra sequence", {"junction_aa": "CAVRWGGKLSF", "chain_1_v_gene": "TRAV3*01"}),
    ("tra:CAGLLPGGGADGLTF", "tra sequence", {"junction_aa": "CAGLLPGGGADGLTF"}),
    ("tra:CAVDNNNDMRF", "tra sequence", {"junction_aa": "CAVDNNNDMRF"}),
]
TRB = [
    ("trb:CASSEGGVETQYF", "trb sequence", {"junction_aa": "CASSEGGVETQYF"}),
    ("trb:CASSSRGGQETQYF", "trb sequence", {"junction_aa": "CASSSRGGQETQYF"}),
    ("trb:CASSPRGDSGNTIYF", "trb sequence", {"junction_aa": "CASSPRGDSGNTIYF"}),
]
EPITOPES = [
    ("epitope:NLVPMVATV", "epitope", {"antigen_name": "pp65", "antigen_organism": "CMV", "MHC_class": "MHCI"}),
    ("epitope:KLGGALQAK", "epitope", {"antigen_name": "IE1", "antigen_organism": "CMV", "MHC_class": "MHCI"}),
    ("epitope:GILGFVFTL", "epitope", {"antigen_name": "M", "antigen_organism": "InfluenzaA", "MHC_class": "MHCI"}),
]
PAIR_LABEL = "alpha sequence to beta sequence association"
BIND_LABEL = "t cell receptor sequence to epitope association"
PAIR_EDGES = [
    ("tra:CAVRWGGKLSF", "trb:CASSEGGVETQYF", "p1", PAIR_LABEL, {}),
    ("tra:CAGLLPGGGADGLTF", "trb:CASSSRGGQETQYF", "p2", PAIR_LABEL, {}),
    ("tra:CAVDNNNDMRF", "trb:CASSPRGDSGNTIYF", "p3", PAIR_LABEL, {}),
]
BIND_EDGES = [
    ("tra:CAVRWGGKLSF", "epitope:NLVPMVATV", "b1", BIND_LABEL, {}),
    ("tra:CAVRWGGKLSF", "epitope:KLGGALQAK", "b2", BIND_LABEL, {}),
    ("trb:CASSPRGDSGNTIYF", "epitope:NLVPMVATV", "b3", BIND_LABEL, {}),
    ("tra:CAVDNNNDMRF", "epitope:GILGFVFTL", "b4", BIND_LABEL, {}),
    ("tra:CAVDNNNDMRF", "epitope:NLVPMVATV", "b5", BIND_LABEL, {}),
]


@pytest.fixture
def kg(spark):
    return AirrKG(spark)


def full_kg(kg):
    kg.add_nodes(TRA + TRB + EPITOPES)
    kg.add_edges(PAIR_EDGES + BIND_EDGES)
    return kg


def test_empty_raises(kg):
    with pytest.raises(ValueError):
        kg.get_kg()


def test_no_epitopes_no_cells(kg):
    # mirrors test_to_airr_cells_basic: a pair with no bindings yields nothing
    kg.add_nodes([TRA[2], TRB[2]])
    kg.add_edges([PAIR_EDGES[2]])
    assert kg.get_kg().count() == 0


def test_single_paired_cell_with_epitope(kg):
    # mirrors test_to_airr_cells_with_epitope: pair 3 + GILGFVFTL binding only
    kg.add_nodes([TRA[2], TRB[2], EPITOPES[2]])
    kg.add_edges([PAIR_EDGES[2], ("tra:CAVDNNNDMRF", "epitope:GILGFVFTL", "b4", BIND_LABEL, {})])
    cells = kg.to_cells()
    assert len(cells) == 1
    cell = cells[0]
    assert cell["antigen_name"] == "M"
    assert cell["antigen_organism"] == "InfluenzaA"
    assert cell["MHC_class"] == "MHCI"
    assert cell["is_paired"] is True and cell["data_source"] == "BioCypher"


def test_multiple_epitopes_per_tcr_indirect(kg):
    # mirrors test_multiple_epitopes_per_tcr: 4 cells under union pairing
    cells = full_kg(kg).to_cells(indirect_pairings=True)
    assert len(cells) == 4
    alpha_junctions = [c["chains"][0]["junction_aa"] for c in cells]
    assert "CAVRWGGKLSF" in alpha_junctions
    assert "CAVDNNNDMRF" in alpha_junctions
    # pair 1 binds two epitopes -> meta-numbered second cell
    ids = sorted(c["cell_id"] for c in cells)
    assert ids == ["p1", "p1_meta2", "p3", "p3_meta2"]
    # every chain here binds something -> validated_epitope true on alphas
    p1 = next(c for c in cells if c["cell_id"] == "p1")
    assert p1["chains"][0]["validated_epitope"] == "true"
    assert p1["chains"][1]["validated_epitope"] == "false"  # trb:CASSEGGVETQYF has no binding
    assert p1["chains"][0]["locus"] == "TRA" and p1["chains"][1]["locus"] == "TRB"


def test_no_indirect_pairings_intersection(kg):
    # mirrors test_no_indirect_pairings: 4 cells under strict pairing
    cells = full_kg(kg).to_cells(indirect_pairings=False)
    assert len(cells) == 4
    ids = sorted(c["cell_id"] for c in cells)
    # p1 shares nothing -> 2 unpaired source cells; p3 shares NLVPMVATV ->
    # 1 paired + 1 source-exclusive unpaired
    assert ids == [
        "p3",
        "unpaired_tra:CAVDNNNDMRF",
        "unpaired_tra:CAVRWGGKLSF",
        "unpaired_tra:CAVRWGGKLSF_meta2",
    ]
    p3 = next(c for c in cells if c["cell_id"] == "p3")
    assert p3["is_paired"] is True and len(p3["chains"]) == 2
    unp = next(c for c in cells if c["cell_id"].startswith("unpaired_tra:CAVD"))
    assert unp["is_paired"] is False and len(unp["chains"]) == 1
    assert unp["antigen_name"] == "M"  # GILGFVFTL is the source-exclusive epitope


def test_unpaired_chain_without_pairing_edge(kg):
    # a chain that binds but is never paired -> unpaired cell
    kg.add_nodes([TRA[0], EPITOPES[0]])
    kg.add_edges([BIND_EDGES[0]])
    cells = kg.to_cells()
    assert len(cells) == 1
    assert cells[0]["cell_id"] == "unpaired_tra:CAVRWGGKLSF"
    assert cells[0]["is_paired"] is False
    assert cells[0]["chains"][0]["consensus_count"] == "0"
    assert cells[0]["chains"][0]["productive"] == "true"


def test_internal_properties_filtered(kg):
    kg.add_nodes([("tra:X", "tra sequence", {"junction_aa": "X", "preferred_id": "tra:X"}), EPITOPES[0]])
    kg.add_edges([("tra:X", "epitope:NLVPMVATV", "b", BIND_LABEL, {})])
    chain = kg.to_cells()[0]["chains"][0]
    assert "preferred_id" not in chain and chain["junction_aa"] == "X"
