"""Neo4j batch-writer golden tests (mirror of reference test_neo4j.py)."""

import os

import pytest

from biocypher_spark.mapping import SchemaMapping
from biocypher_spark.model import edges_from_tuples, nodes_from_tuples
from biocypher_spark.ontology import NullOntology, Ontology
from biocypher_spark.translate import SparkTranslator
from biocypher_spark.writer.neo4j import Neo4jBatchWriter
from fixtures.data_generator import (
    mirna_nodes,
    mutated_edges,
    perturbed_edges,
    protein_nodes,
    rel_as_node_edges,
)


@pytest.fixture()
def bw(spark, schema_path, tmp_path):
    translator = SparkTranslator(spark, NullOntology(SchemaMapping(schema_path)))
    return Neo4jBatchWriter(spark, translator, str(tmp_path))


def read(path):
    with open(path) as fh:
        return fh.read()


def _write_translated_nodes(spark, bw, tuples):
    out = bw.translator.translate_nodes(nodes_from_tuples(spark, tuples))
    assert bw.write_nodes(out.nodes)
    return out


def test_node_headers_and_data(spark, bw, tmp_path):
    _write_translated_nodes(spark, bw, protein_nodes(4) + mirna_nodes(4))
    bw.write_import_call()

    header = read(tmp_path / "Protein-header.csv")
    assert header == ":ID;name;score:double;taxon:long;genes:string[];id;preferred_id;:LABEL"
    mirna_header = read(tmp_path / "MicroRNA-header.csv")
    assert mirna_header == ":ID;name;taxon:long;id;preferred_id;:LABEL"

    protein = read(tmp_path / "Protein-part000.csv")
    # golden line (reference test_neo4j.py:321-324 with headless label)
    assert "p1;'StringProperty1';4.0;9606;'gene1|gene2';'p1';'uniprot';'Protein'" in protein
    assert len(protein.strip().split("\n")) == 4
    mirna = read(tmp_path / "MicroRNA-part000.csv")
    assert "m1;'StringProperty1';9606;'m1';'mirbase.mature';'MicroRNA'" in mirna

    call = read(tmp_path / "neo4j-admin-import-call.sh")
    assert "neo4j-admin" in call
    assert '--delimiter=";"' in call
    assert '--nodes="' in call
    assert "Protein-header.csv" in call and 'Protein-part.*"' in call


def test_property_quote_escaping(spark, bw, tmp_path):
    _write_translated_nodes(
        spark,
        bw,
        [("p1", "protein", {"name": "Pandora's box", "score": 4.0, "taxon": 9606, "genes": ["g1"]})],
    )
    data = read(tmp_path / "Protein-part000.csv")
    assert "p1;'Pandora''s box'" in data


def test_newline_scrubbing(spark, bw, tmp_path):
    _write_translated_nodes(
        spark,
        bw,
        [("p1", "protein", {"name": "line1\nline2\rx", "score": 1.0, "taxon": 1, "genes": ["a\nb"]})],
    )
    data = read(tmp_path / "Protein-part000.csv")
    assert "'line1 line2 x'" in data
    assert "'a b'" in data


def test_boolean_and_inferred_props(spark, bw, tmp_path):
    # post translational interaction has no declared properties -> inference
    out = bw.translator.translate_edges(
        edges_from_tuples(
            spark,
            [
                ("i1", "a1", "a2", "post_translational", {"directed": True, "effect": -1}),
                ("i2", "a2", "a3", "post_translational", {"directed": False, "effect": 1}),
            ],
        )
    )
    assert bw.write_edges(out)
    data = read(tmp_path / "PostTranslationalInteraction-part000.csv")
    assert "i1;true;-1;'i1';'id';'PostTranslationalInteraction'" in data
    assert "i2;false;1;'i2';'id';'PostTranslationalInteraction'" in data
    assert "True" not in data and "False" not in data


def test_edge_headers_and_data(spark, bw, tmp_path):
    out = bw.translator.translate_edges(
        edges_from_tuples(spark, perturbed_edges(4)[1:] + mutated_edges(4)[1:])
    )
    assert bw.write_edges(out)
    assert read(tmp_path / "PERTURBED_IN_DISEASE-header.csv") == ":START_ID;id;residue;level:long;:END_ID;:TYPE"
    assert read(tmp_path / "Is_Mutated_In-header.csv") == ":START_ID;id;site;confidence:long;:END_ID;:TYPE"
    pid = read(tmp_path / "PERTURBED_IN_DISEASE-part000.csv")
    assert "prel1;p1;'T253';4;p2;'PERTURBED_IN_DISEASE'".replace("prel1;p1", "p1;prel1") in pid or (
        "p1;prel1;'T253';4;p2;'PERTURBED_IN_DISEASE'" in pid
    )
    mut = read(tmp_path / "Is_Mutated_In-part000.csv")
    assert "m1;mrel1;'3-UTR';1;p2;'Is_Mutated_In'" in mut


def test_write_duplicate_edges(spark, bw, tmp_path):
    edges = perturbed_edges(4)[1:] + mutated_edges(4)[1:]
    edges.append(edges[0])
    out = bw.translator.translate_edges(edges_from_tuples(spark, edges))
    assert bw.write_edges(out)
    pid = read(tmp_path / "PERTURBED_IN_DISEASE-part000.csv")
    assert len(pid.strip().split("\n")) == 3
    dups = bw.get_duplicate_edges().collect()
    assert {(d["label"], d["dup_id"]) for d in dups} == {("PERTURBED_IN_DISEASE", "prel1")}


def test_rel_as_node(spark, bw, tmp_path):
    out = bw.translator.translate_edges(edges_from_tuples(spark, rel_as_node_edges(4)))
    assert bw.write_edges(out)
    iso = read(tmp_path / "IS_SOURCE_OF-part000.csv")
    ito = read(tmp_path / "IS_TARGET_OF-part000.csv")
    pti = read(tmp_path / "PostTranslationalInteraction-part000.csv")
    assert "i1;" in iso and "p1;" in iso and "IS_SOURCE_OF" in iso
    assert "i1;" in ito and "p2;" in ito and "IS_TARGET_OF" in ito
    assert "i1;true;-1;'i1';'id'" in pti
    # IS_SOURCE_OF header has no id column
    assert read(tmp_path / "IS_SOURCE_OF-header.csv") == ":START_ID;:END_ID;:TYPE"


def test_part_numbering_across_calls(spark, bw, tmp_path):
    _write_translated_nodes(spark, bw, protein_nodes(2))
    _write_translated_nodes(spark, bw, protein_nodes(4)[2:])
    assert os.path.isfile(tmp_path / "Protein-part000.csv")
    assert os.path.isfile(tmp_path / "Protein-part001.csv")
    p0 = read(tmp_path / "Protein-part000.csv")
    p1 = read(tmp_path / "Protein-part001.csv")
    assert "p1;" in p0 and "p3;" in p1


def test_batch_size_splits_parts(spark, bw, tmp_path):
    bw.batch_size = 3
    _write_translated_nodes(spark, bw, protein_nodes(7))
    files = sorted(f for f in os.listdir(tmp_path) if f.startswith("Protein-part"))
    assert files == ["Protein-part000.csv", "Protein-part001.csv", "Protein-part002.csv"]
    # ordering: first file holds p1..p3 in arrival order
    assert read(tmp_path / "Protein-part000.csv").startswith("p1;")
    lines = read(tmp_path / "Protein-part000.csv").strip().split("\n")
    assert [ln.split(";")[0] for ln in lines] == ["p1", "p2", "p3"]
    assert read(tmp_path / "Protein-part002.csv").startswith("p7;")


def test_duplicate_nodes_skipped_across_calls(spark, bw, tmp_path):
    _write_translated_nodes(spark, bw, protein_nodes(2))
    _write_translated_nodes(spark, bw, protein_nodes(3))  # p1,p2 dups
    p1 = read(tmp_path / "Protein-part001.csv")
    assert [ln.split(";")[0] for ln in p1.strip().split("\n")] == ["p3"]
    dups = {(d["kind"], d["dup_id"]) for d in bw.get_duplicate_nodes().collect()}
    assert dups == {("node", "p1"), ("node", "p2")}


def test_inconsistent_props_raise(spark, bw):
    # microRNA has no declared properties -> first-entity inference; a second
    # entity with a different key set must fail (reference
    # test_neo4j.py:523-573 semantics)
    out = bw.translator.translate_nodes(
        nodes_from_tuples(
            spark,
            [("m1", "mirna", {"name": "x", "taxon": 9606}), ("m2", "mirna", {"name": "y"})],
        )
    )
    with pytest.raises(ValueError, match="more or fewer properties"):
        bw.write_nodes(out.nodes)


def test_labels_order_with_ontology(spark, schema_path, tmp_path):
    # small hierarchy: protein -> polypeptide -> biological entity
    onto = Ontology(
        SchemaMapping(schema_path),
        parent_map={"protein": "polypeptide", "polypeptide": "biological entity"},
    )
    translator = SparkTranslator(spark, onto)

    for order, expected in [
        ("Ascending", "'Protein|Polypeptide|BiologicalEntity'"),
        ("Descending", "'BiologicalEntity|Polypeptide|Protein'"),
        ("Alphabetical", "'BiologicalEntity|Polypeptide|Protein'"),
        ("Leaves", "'Protein'"),
    ]:
        outdir = tmp_path / order
        bw = Neo4jBatchWriter(spark, translator, str(outdir), labels_order=order)
        out = translator.translate_nodes(nodes_from_tuples(spark, protein_nodes(1)))
        bw.write_nodes(out.nodes)
        data = read(outdir / "Protein-part000.csv")
        assert data.strip().split(";")[-1] == expected, order


def test_batch_boundary_cases(spark, bw, tmp_path):
    """Reference parametrizes 1e4 and 1e4+4 around the batch size
    (test_neo4j.py:496-520,632-670): exactly full batches must not produce
    an empty trailing part file."""
    bw.batch_size = int(1e4)
    _write_translated_nodes(spark, bw, protein_nodes(10004))
    files = sorted(f for f in os.listdir(tmp_path) if f.startswith("Protein-part"))
    assert files == ["Protein-part000.csv", "Protein-part001.csv"]
    n0 = sum(1 for _ in open(tmp_path / "Protein-part000.csv"))
    n1 = sum(1 for _ in open(tmp_path / "Protein-part001.csv"))
    assert (n0, n1) == (10000, 4)


def test_object_store_output_dir_rejected(spark, schema_path):
    # part-file glob/rename and neo4j-admin import are local-filesystem;
    # an object-store URI must fail at construction, not corrupt silently.
    # file:// must fail too: Spark resolves it to the real path while
    # os.makedirs/glob treat it literally (makedirs('file:///x') creates
    # './file:/x'), so the layout would be written one place and
    # renamed/read from another
    translator = SparkTranslator(spark, NullOntology(SchemaMapping(schema_path)))
    for bad in ("s3a://bucket/out", "file:///mnt/out"):
        with pytest.raises(ValueError, match="local"):
            Neo4jBatchWriter(spark, translator, bad)


def test_uri_output_dir_rejected_across_writers(spark, schema_path):
    # every writer whose layout goes Spark-write -> driver-side glob/rename
    # shares the same guard (RDF, BioPathNet, pandas-CSV)
    from biocypher_spark.inmemory import PandasCSVWriter
    from biocypher_spark.writer.biopathnet import BioPathNetWriter
    from biocypher_spark.writer.rdf import RDFWriter

    translator = SparkTranslator(spark, NullOntology(SchemaMapping(schema_path)))
    for bad in ("s3a://bucket/out", "file:///mnt/out"):
        with pytest.raises(ValueError, match="local"):
            RDFWriter(spark, translator, bad)
        with pytest.raises(ValueError, match="local"):
            BioPathNetWriter(spark, translator, bad)
        with pytest.raises(ValueError, match="local"):
            PandasCSVWriter(bad)


def test_duplicate_metrics_chain_collapses(spark, bw):
    """The duplicate-metrics frames must not grow one lazy union layer per
    writer call forever: every _DUP_COLLAPSE appends the chain is
    distinct-ed and pinned, so a long-running stream's eventual metrics
    evaluation pays a bounded plan, and set semantics still hold through
    the accessors."""
    rows = [("node", "protein", f"p{i % 7}") for i in range(3)]
    df = spark.createDataFrame(rows, "kind string, label string, dup_id string")
    for _ in range(2 * bw._DUP_COLLAPSE + 3):
        bw._note_dups("duplicate_nodes", df)
    assert bw._dup_chain_len["duplicate_nodes"] < bw._DUP_COLLAPSE
    got = {(r["kind"], r["label"], r["dup_id"]) for r in bw.get_duplicate_nodes().collect()}
    assert got == {("node", "protein", f"p{i}") for i in range(3)}


def test_strict_mode_tolerates_both_license_spellings(spark, schema_path):
    """An entity carrying BOTH 'license' and 'licence' must not crash with
    DUPLICATED_MAP_KEY — 'license' wins, matching the reference's
    props['licence'] = props.pop('license')."""
    t = SparkTranslator(spark, NullOntology(SchemaMapping(schema_path)), strict_mode=True)
    nodes = t.translate_nodes(
        nodes_from_tuples(
            spark,
            [("p1", "protein", {
                "license": "MIT", "licence": "GPL",
                "source": "s", "version": "1",
                "name": "x", "score": 1.0, "taxon": 9606, "genes": [],
            })],
        )
    )
    rows = nodes.nodes.collect()
    assert len(rows) == 1
    assert rows[0]["props"]["licence"] == '"MIT"'


def test_edge_labels_order_validated(spark, schema_path, tmp_path):
    # Postgres writer: edge order is NOT forced, so a typo'd value must
    # raise instead of silently falling through to Ascending
    from biocypher_spark.writer.postgres import PostgresBatchWriter

    translator = SparkTranslator(spark, NullOntology(SchemaMapping(schema_path)))
    with pytest.raises(ValueError, match="Invalid labels_order"):
        PostgresBatchWriter(
            spark, translator, str(tmp_path), node_labels_order="Ascending",
            edge_labels_order="leaves",
        )


def test_empty_sanitized_label_gets_placeholder():
    from biocypher_spark.writer.base import pascal_file_label

    assert pascal_file_label("") == "Unlabeled"
    assert pascal_file_label("\u6f22\u5b57") == "Unlabeled"
    assert pascal_file_label("protein") == "Protein"


def test_lazy_dedup_matches_eager(spark, schema_path, tmp_path):
    """The stream fast path (lazy_seen_pins) must be OBSERVABLY identical
    to the eager cross-call dedup: same surviving rows in the part files,
    same within-batch and cross-batch duplicate metrics, same seen state.
    Two batches: batch 1 carries an in-batch duplicate (p1 twice, second
    occurrence under a different label); batch 2 replays p1/p2 (cross-batch
    dups) and introduces p3 with its own in-batch duplicate."""
    import glob as _glob

    translator = SparkTranslator(spark, NullOntology(SchemaMapping(schema_path)))
    batch1 = [
        ("p1", "protein", {"name": "a", "score": 1.0, "taxon": 1, "genes": []}),
        ("p2", "protein", {"name": "b", "score": 2.0, "taxon": 1, "genes": []}),
        ("p1", "mirna", {"name": "dup", "taxon": 1}),
    ]
    batch2 = [
        ("p1", "protein", {"name": "a2", "score": 3.0, "taxon": 1, "genes": []}),
        ("p3", "protein", {"name": "c", "score": 4.0, "taxon": 1, "genes": []}),
        ("p3", "protein", {"name": "c-dup", "score": 5.0, "taxon": 1, "genes": []}),
        ("p2", "mirna", {"name": "replay", "taxon": 1}),
    ]

    results = {}
    for mode, lazy in (("eager", False), ("lazy", True)):
        outdir = tmp_path / mode
        outdir.mkdir()
        w = Neo4jBatchWriter(
            spark, translator, str(outdir), ordered_parts=False,
            track_seen=True, lazy_seen_pins=lazy,
        )
        for batch in (batch1, batch2):
            w.write_nodes(translator.translate_nodes(nodes_from_tuples(spark, batch)).nodes)
        lines = sorted(
            line
            for p in _glob.glob(str(outdir / "*-part*.csv"))
            for line in open(p).read().splitlines()
        )
        dups = sorted(
            (r["kind"], r["label"], r["dup_id"])
            for r in w.get_duplicate_nodes().distinct().collect()
        )
        seen = sorted(r["_key"] for r in w._seen_nodes.collect())
        results[mode] = (lines, dups, seen)

    assert results["lazy"][0] == results["eager"][0]  # surviving rows
    assert results["lazy"][1] == results["eager"][1]  # duplicate metrics
    assert results["lazy"][2] == results["eager"][2] == ["p1", "p2", "p3"]
    # and the metrics themselves are what the two batches imply
    assert results["lazy"][1] == [
        ("node", "microRNA", "p1"),  # batch-1 in-batch dup (second label)
        ("node", "microRNA", "p2"),  # batch-2 cross-batch replay of p2
        ("node", "protein", "p1"),   # batch-2 cross-batch replay of p1
        ("node", "protein", "p3"),   # batch-2 in-batch dup
    ]
