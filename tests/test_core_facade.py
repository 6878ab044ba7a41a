"""Facade + in-memory KG tests (mirror of reference test_core.py surface)."""

import os

import pytest
from pyspark.sql import functions as F

from biocypher_spark.core import BioCypherSpark
from fixtures.data_generator import (
    mirna_nodes,
    mutated_edges,
    perturbed_edges,
    protein_nodes,
    rel_as_node_edges,
)


@pytest.fixture()
def bc(spark, schema_path, tmp_path):
    return BioCypherSpark(spark, output_directory=str(tmp_path), schema_config_path=schema_path)


def test_write_nodes_from_tuples(bc, tmp_path):
    assert bc.write_nodes(protein_nodes(4) + mirna_nodes(4))
    bc.write_import_call()
    assert os.path.isfile(tmp_path / "Protein-part000.csv")
    assert os.path.isfile(tmp_path / "MicroRNA-header.csv")
    assert os.path.isfile(tmp_path / "neo4j-admin-import-call.sh")


def test_write_edges_and_missing(bc, tmp_path):
    edges = perturbed_edges(4)[1:] + [("x1", "a", "b", "nonexistent_label", {})]
    assert bc.write_edges(edges)
    assert os.path.isfile(tmp_path / "PERTURBED_IN_DISEASE-part000.csv")
    assert bc.log_missing_input_labels() == {"nonexistent_label": 1}


def test_in_memory_kg(bc):
    bc.add(protein_nodes(4))
    bc.add(mirna_nodes(2))
    bc.add(perturbed_edges(4)[1:])
    kg = bc.get_kg()
    # edge frames are keyed by relationship label (reference keys per-type
    # frames by entity.get_type(), output/in_memory/_in_memory_kg.py)
    assert set(kg) == {"protein", "microRNA", "PERTURBED_IN_DISEASE"}
    dfs = bc.to_df()
    prot = dfs["protein"]
    assert len(prot) == 4
    assert set(prot.columns) >= {"node_id", "name", "score", "taxon", "genes", "id", "preferred_id"}
    assert prot.loc[prot.node_id == "p1", "score"].iloc[0] == 4.0
    assert list(prot.loc[prot.node_id == "p1", "genes"].iloc[0]) == ["gene1", "gene2"]
    edges = dfs["PERTURBED_IN_DISEASE"]
    assert len(edges) == 3
    assert set(edges.columns) >= {"source_id", "target_id", "residue", "level"}


def test_in_memory_rel_as_node(bc):
    bc.add(rel_as_node_edges(3))
    kg = bc.get_kg()
    assert "post translational interaction" in kg
    assert "IS_SOURCE_OF" in kg
    assert kg["post translational interaction"].count() == 3
    assert kg["IS_SOURCE_OF"].count() == 3


def test_to_networkx(bc):
    bc.add(protein_nodes(3))
    bc.add(perturbed_edges(3)[1:])
    g = bc.to_networkx()
    assert g.number_of_nodes() >= 3
    assert g.number_of_edges() == 2
    assert g.nodes["p1"]["node_label"] == "protein"


def test_write_csv(bc, tmp_path):
    bc.add(protein_nodes(2))
    files = bc.write_csv()
    assert any(f.endswith("Protein.csv") for f in files)
    with open([f for f in files if f.endswith("Protein.csv")][0]) as fh:
        header = fh.readline()
    assert "node_id" in header and "score" in header


def test_schema_info(bc, tmp_path):
    bc.write_nodes(protein_nodes(2))
    info = bc.write_schema_info()
    assert info["is_schema_info"] is True
    assert info["protein"]["present_in_knowledge_graph"] is True
    assert info["microRNA"]["present_in_knowledge_graph"] is False
    assert info["gene to disease association"]["is_relationship"] is True
    assert os.path.isfile(tmp_path / "schema_info.yaml")


def test_duplicate_logging(bc):
    bc.write_nodes(protein_nodes(2) + protein_nodes(2))
    dups = bc.writer.get_duplicate_nodes()
    assert {r["dup_id"] for r in dups.collect()} == {"p1", "p2"}


def test_dbms_registry_owl(spark, schema_path, tmp_path):
    """dbms routing (reference _get_writer.py DBMS_TO_CLASS): the facade can
    drive the OWL sink end-to-end."""
    bc = BioCypherSpark(
        spark, dbms="owl", output_directory=str(tmp_path), schema_config_path=schema_path
    )
    assert bc.write_nodes(protein_nodes(2))
    assert bc.write_edges(perturbed_edges(3)[1:])
    owl = open(tmp_path / "biocypher.nt").read()
    assert "owl#NamedIndividual" in owl
    assert "edge_source" in owl  # Association default


def test_dbms_registry_postgres(spark, schema_path, tmp_path):
    bc = BioCypherSpark(
        spark, dbms="postgresql", output_directory=str(tmp_path), schema_config_path=schema_path
    )
    assert bc.write_nodes(protein_nodes(2))
    assert os.path.isfile(tmp_path / "protein-create_table.sql")


def test_dbms_registry_errors(spark, schema_path, tmp_path):
    bc = BioCypherSpark(
        spark, dbms="networkx", output_directory=str(tmp_path), schema_config_path=schema_path
    )
    with pytest.raises(ValueError, match="to_networkx"):
        bc.writer
    bc2 = BioCypherSpark(
        spark, dbms="mongodb", output_directory=str(tmp_path), schema_config_path=schema_path
    )
    with pytest.raises(ValueError, match="unknown dbms"):
        bc2.writer


def test_facade_download(bc, tmp_path):
    from biocypher_spark.download import Downloader, FileDownload

    fetched = []

    def fake_fetch(url, dest):
        fetched.append(url)
        with open(dest, "w") as f:
            f.write("x")

    bc.downloader = Downloader(cache_dir=str(tmp_path / "dlcache"), fetcher=fake_fetch)
    paths = bc.download(FileDownload("r", "http://x/y.txt"))
    assert len(paths) == 1 and fetched == ["http://x/y.txt"]
    bc.download(FileDownload("r", "http://x/y.txt"))
    assert len(fetched) == 1  # cached


def test_dbms_owl_rel_as_node_flattened(spark, schema_path, tmp_path):
    """DataFrame-interface sinks receive rel-as-node helper nodes/edges
    flattened in (the batch family rebuilds them itself)."""
    bc = BioCypherSpark(
        spark, dbms="owl", output_directory=str(tmp_path), schema_config_path=schema_path
    )
    assert bc.write_nodes(protein_nodes(3))
    assert bc.write_edges(rel_as_node_edges(2))
    owl = open(tmp_path / "biocypher.nt").read()
    # reified relationship node instance + IS_SOURCE_OF/IS_TARGET_OF helpers
    assert "i1" in owl
    assert "IS_SOURCE_OF" in owl and "IS_TARGET_OF" in owl


def test_in_memory_cross_call_dedup(bc):
    """The reference shares one Deduplicator across add() calls
    (_in_memory_kg.py:62-66): re-adding the same node/edge in a later call
    must not duplicate rows."""
    bc.add(protein_nodes(2))
    bc.add(protein_nodes(2))
    kg = bc.get_kg()
    assert kg["protein"].count() == 2
    bc.add(perturbed_edges(3)[1:])
    bc.add(perturbed_edges(3)[1:])
    assert bc.get_kg()["PERTURBED_IN_DISEASE"].count() == 2


def test_offline_merge_writes_batch_layout(spark, tmp_path, schema_path):
    """Reference parity: merge_* are _add_* aliases, which write the batch
    layout when offline — not silently accumulate in the in-memory KG."""
    import os

    from biocypher_spark.core import BioCypherSpark
    from fixtures.data_generator import protein_nodes

    bc = BioCypherSpark(spark, output_directory=str(tmp_path), schema_config_path=schema_path)
    assert bc.merge_nodes(protein_nodes(2))
    bc.write_import_call()
    assert os.path.isfile(tmp_path / "Protein-part000.csv")


def test_staged_dataframe_without_seq(spark, tmp_path, schema_path):
    """A user-staged frame lacking the _seq ordering column must be
    accepted (with_seq attaches it) instead of UNRESOLVED_COLUMN."""
    from biocypher_spark.core import BioCypherSpark

    bc = BioCypherSpark(spark, output_directory=str(tmp_path), schema_config_path=schema_path)
    df = spark.createDataFrame(
        [("p1", "protein", {"name": '"x"', "score": "1.0", "taxon": "9606", "genes": "[]"})],
        "id string, input_label string, props map<string,string>",
    )
    bc.add(df)
    kg = bc.get_kg()
    assert any(frame.count() == 1 for frame in kg.values())


def test_inmemory_prop_union_across_rows(spark, tmp_path, schema_path):
    """Property columns are the key UNION of the batch, not just the first
    row's keys (microRNA has no declared properties -> inference)."""
    from biocypher_spark.core import BioCypherSpark

    bc = BioCypherSpark(spark, output_directory=str(tmp_path), schema_config_path=schema_path)
    bc.add([
        ("m1", "mirna", {"name": "x"}),
        ("m2", "mirna", {"name": "y", "taxon": 9606}),
    ])
    kg = bc.get_kg()
    mirna = next(df for label, df in kg.items() if label.lower() == "microrna")
    assert "taxon" in mirna.columns
    rows = {r["id"]: r for r in mirna.collect()}
    assert rows["m2"]["taxon"] == 9606 and rows["m1"]["taxon"] is None
