"""Secondary sink tests: PostgreSQL, SQLite, ArangoDB, RDF (S4/S5/S6/S8)."""

import os

import pytest

from biocypher_spark.mapping import SchemaMapping
from biocypher_spark.model import edges_from_tuples, nodes_from_tuples
from biocypher_spark.ontology import NullOntology
from biocypher_spark.translate import SparkTranslator
from biocypher_spark.writer.arango import ArangoDBBatchWriter
from biocypher_spark.writer.postgres import PostgresBatchWriter, SQLiteBatchWriter
from biocypher_spark.writer.rdf import RDFWriter
from fixtures.data_generator import mirna_nodes, perturbed_edges, protein_nodes


@pytest.fixture()
def translator(spark, schema_path):
    return SparkTranslator(spark, NullOntology(SchemaMapping(schema_path)))


def read(p):
    with open(p) as fh:
        return fh.read()


def test_postgres_writer(spark, translator, tmp_path):
    bw = PostgresBatchWriter(spark, translator, str(tmp_path), delimiter=";")
    out = translator.translate_nodes(nodes_from_tuples(spark, protein_nodes(3)))
    assert bw.write_nodes(out.nodes)
    oute = translator.translate_edges(edges_from_tuples(spark, perturbed_edges(3)[1:]))
    assert bw.write_edges(oute)
    bw.write_import_call()

    ddl = read(tmp_path / "protein-create_table.sql")
    assert "DROP TABLE IF EXISTS protein;" in ddl
    assert "CREATE TABLE protein(_ID VARCHAR,name VARCHAR,score NUMERIC,taxon INTEGER,genes VARCHAR[],id VARCHAR,preferred_id VARCHAR,_LABEL VARCHAR[])" in ddl
    edge_ddl = read(tmp_path / "perturbed_in_disease-create_table.sql")
    assert "_START_ID VARCHAR,_ID VARCHAR" in edge_ddl
    assert "_END_ID VARCHAR,_TYPE VARCHAR" in edge_ddl

    data = read(tmp_path / "Protein-part000.csv")
    # pg array literal + plain quoting
    assert '"{gene1,gene2}"' in data
    assert '"StringProperty1"' in data
    assert '"{Protein}"' in data

    call = read(tmp_path / "neo4j-import-call.sh")
    assert "psql -f" in call and "\\copy protein FROM" in call


def test_sqlite_writer(spark, translator, tmp_path):
    bw = SQLiteBatchWriter(spark, translator, str(tmp_path), delimiter=";", db_name="test.db")
    out = translator.translate_nodes(nodes_from_tuples(spark, mirna_nodes(2)))
    assert bw.write_nodes(out.nodes)
    path = bw.write_import_call()
    call = read(path)
    assert "sqlite3 test.db <" in call
    assert '.import' in call


def test_arango_writer(spark, translator, tmp_path):
    bw = ArangoDBBatchWriter(spark, translator, str(tmp_path))
    out = translator.translate_nodes(nodes_from_tuples(spark, protein_nodes(2)))
    assert bw.write_nodes(out.nodes)
    oute = translator.translate_edges(edges_from_tuples(spark, perturbed_edges(3)[1:]))
    assert bw.write_edges(oute)
    bw.write_import_call()

    header = read(tmp_path / "Protein-header.csv")
    assert header.startswith("_key;")
    assert ":LABEL" not in header
    edge_header = read(tmp_path / "PERTURBED_IN_DISEASE-header.csv")
    assert edge_header.startswith("_from;_key;")
    assert edge_header.endswith(";_to")
    data = read(tmp_path / "Protein-part000.csv")
    # no trailing label column: last field is preferred_id
    assert data.splitlines()[0].endswith("'uniprot'")
    call = read(tmp_path / "arangodb-import-call.sh")
    assert "arangoimp" in call and "--collection proteins" in call


def test_rdf_writer(spark, translator, tmp_path):
    w = RDFWriter(spark, translator, str(tmp_path))
    nodes = translator.translate_nodes(nodes_from_tuples(spark, protein_nodes(2))).nodes
    edges = translator.translate_edges(edges_from_tuples(spark, perturbed_edges(3)[1:])).edges
    w.write_nodes(nodes)
    w.write_edges(edges)
    nt = read(tmp_path / "Protein.nt")
    assert "<https://biocypher.org/biocypher#p1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <https://biocypher.org/biocypher#Protein> ." in nt
    assert '"StringProperty1" .' in nt
    ent = read(tmp_path / "PERTURBED_IN_DISEASE.nt")
    # reference parity: subject/object live in the BIOCYPHER namespace
    # (as_uri('subject', 'biocypher')), properties ride the reified edge,
    # and the edge class is typed rdfs:Class in its file
    assert "biocypher#subject>" in ent and "biocypher#object>" in ent
    assert '#residue> "T253" .' in ent
    assert "<https://biocypher.org/biocypher#PERTURBED_IN_DISEASE> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2000/01/rdf-schema#Class> ." in ent


def test_rdf_writer_turtle(spark, translator, tmp_path):
    """Turtle serialization: @prefix header + prefixed names, same triples
    as the N-Triples path (reference _rdf.py multi-format support)."""
    out = tmp_path / "ttl"
    w = RDFWriter(spark, translator, str(out), rdf_format="turtle")
    nodes = translator.translate_nodes(nodes_from_tuples(spark, protein_nodes(2))).nodes
    edges = translator.translate_edges(edges_from_tuples(spark, perturbed_edges(3)[1:])).edges
    w.write_nodes(nodes)
    w.write_edges(edges)
    ttl = read(out / "Protein.ttl")
    assert ttl.startswith("@prefix bc: <https://biocypher.org/biocypher#> .")
    assert "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> ." in ttl
    assert "bc:p1 rdf:type bc:Protein ." in ttl
    ent = read(out / "PERTURBED_IN_DISEASE.ttl")
    assert "bc:subject bc:p" in ent and "bc:object bc:" in ent
    assert "bc:PERTURBED_IN_DISEASE rdf:type rdfs:Class ." in ent
    # triple count parity with the ntriples path (modulo header)
    w2 = RDFWriter(spark, translator, str(tmp_path / "nt"))
    w2.write_nodes(nodes)
    nt = read(tmp_path / "nt" / "Protein.nt")
    assert len([l for l in ttl.splitlines() if l.endswith(" .") and not l.startswith("@prefix")]) == len(
        [l for l in nt.splitlines() if l]
    )


def test_rdf_writer_unsupported_format(spark, translator, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="not supported"):
        RDFWriter(spark, translator, str(tmp_path), rdf_format="hext")


def test_rdf_writer_trig(spark, translator, tmp_path):
    """TriG: the turtle triples inside a default-graph block (reference
    _rdf.py accepts any rdflib format incl. trig)."""
    out = tmp_path / "trig"
    w = RDFWriter(spark, translator, str(out), rdf_format="trig")
    nodes = translator.translate_nodes(nodes_from_tuples(spark, protein_nodes(2))).nodes
    edges = translator.translate_edges(edges_from_tuples(spark, perturbed_edges(3)[1:])).edges
    w.write_nodes(nodes)
    w.write_edges(edges)
    trig = read(out / "Protein.trig")
    assert trig.startswith("@prefix bc: <https://biocypher.org/biocypher#> .")
    body = trig.split("{", 1)[1].rsplit("}", 1)[0]
    assert "bc:p1 rdf:type bc:Protein ." in body
    assert trig.rstrip().endswith("}")
    ent = read(out / "PERTURBED_IN_DISEASE.trig")
    assert "bc:subject bc:p" in ent and ent.rstrip().endswith("}")


def test_rdf_writer_trix(spark, translator, tmp_path):
    """TriX: schema-regular XML, one <triple> element per emitted triple,
    well-formed per the stdlib parser."""
    import xml.etree.ElementTree as ET

    out = tmp_path / "trix"
    w = RDFWriter(spark, translator, str(out), rdf_format="trix")
    nodes = translator.translate_nodes(nodes_from_tuples(spark, protein_nodes(2))).nodes
    edges = translator.translate_edges(edges_from_tuples(spark, perturbed_edges(3)[1:])).edges
    w.write_nodes(nodes)
    w.write_edges(edges)
    doc = ET.fromstring(read(out / "Protein.trix"))
    ns = "{http://www.w3.org/2004/03/trix/trix-1/}"
    triples = doc.findall(f"{ns}graph/{ns}triple")
    assert len(triples) > 2  # type triple + property triples per node
    # every triple has exactly 3 term children; terms are uri/plainLiteral
    for t in triples:
        assert len(t) == 3
        assert all(c.tag in (f"{ns}uri", f"{ns}plainLiteral") for c in t)
    # the nt path emits the same number of node triples
    w2 = RDFWriter(spark, translator, str(tmp_path / "nt2"))
    w2.write_nodes(nodes)
    nt_lines = [l for l in read(tmp_path / "nt2" / "Protein.nt").splitlines() if l]
    assert len(triples) == len(nt_lines)
    # reified edges: 1 class-typing triple + (3 + n_props) per edge row
    edoc = ET.fromstring(read(out / "PERTURBED_IN_DISEASE.trix"))
    etr = edoc.findall(f"{ns}graph/{ns}triple")
    n_edges = 2  # perturbed_edges(3)[1:]
    n_props = 2  # residue, level
    assert len(etr) == 1 + n_edges * (3 + n_props)


def test_rdf_writer_jsonld(spark, translator, tmp_path):
    """JSON-LD serialization: @context + @graph of per-row objects, string
    escaping via to_json, valid JSON per the stdlib parser."""
    import json

    out = tmp_path / "jsonld"
    w = RDFWriter(spark, translator, str(out), rdf_format="json-ld")
    nodes = translator.translate_nodes(nodes_from_tuples(spark, protein_nodes(2))).nodes
    edges = translator.translate_edges(edges_from_tuples(spark, perturbed_edges(3)[1:])).edges
    w.write_nodes(nodes)
    w.write_edges(edges)
    doc = json.loads(read(out / "Protein.jsonld"))
    assert doc["@context"]["bc"] == "https://biocypher.org/biocypher#"
    graph = doc["@graph"]
    assert len(graph) == 2
    byid = {g["@id"]: g for g in graph}
    assert byid["bc:p1"]["@type"] == "bc:Protein"
    # property keys are bc:-namespaced so @context covers them (un-prefixed
    # keys would be silently dropped by JSON-LD expansion)
    assert "bc:name" in byid["bc:p1"]
    assert not any(k for k in byid["bc:p1"] if not k.startswith(("@", "bc:", "rdf:")))
    ent = json.loads(read(out / "PERTURBED_IN_DISEASE.jsonld"))
    cls_rows = [g for g in ent["@graph"] if g.get("@type") == "rdfs:Class"]
    assert [g["@id"] for g in cls_rows] == ["bc:PERTURBED_IN_DISEASE"]
    for g in ent["@graph"]:
        if g in cls_rows:
            continue
        assert g["@type"] == "bc:PERTURBED_IN_DISEASE"
        assert g["bc:subject"]["@id"].startswith("bc:")
        assert g["bc:object"]["@id"].startswith("bc:")
        assert "bc:residue" in g  # edge props ride the reified edge


def test_rdf_writer_xml(spark, translator, tmp_path):
    """RDF/XML serialization (reference _rdf.py format switch): one
    rdf:Description block per subject, rdf:resource attributes for IRIs,
    escaped literals in property elements, well-formed document."""
    out = tmp_path / "xml"
    w = RDFWriter(spark, translator, str(out), rdf_format="xml")
    nodes = translator.translate_nodes(nodes_from_tuples(spark, protein_nodes(2))).nodes
    edges = translator.translate_edges(edges_from_tuples(spark, perturbed_edges(3)[1:])).edges
    w.write_nodes(nodes)
    w.write_edges(edges)
    xml = read(out / "Protein.xml")
    assert xml.startswith('<?xml version="1.0" encoding="utf-8"?>')
    assert '<rdf:Description rdf:about="https://biocypher.org/biocypher#p1">' in xml
    assert '<rdf:type rdf:resource="https://biocypher.org/biocypher#Protein"/>' in xml
    assert "<bc:name>" in xml and xml.rstrip().endswith("</rdf:RDF>")
    # well-formed per the stdlib parser; Description count = node count
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml)
    descs = root.findall("{http://www.w3.org/1999/02/22-rdf-syntax-ns#}Description")
    assert len(descs) == 2
    ent = read(out / "PERTURBED_IN_DISEASE.xml")
    ET.fromstring(ent)
    assert "<bc:subject rdf:resource=" in ent and "<bc:object rdf:resource=" in ent
    assert "<bc:residue>" in ent
    assert '<rdf:type rdf:resource="http://www.w3.org/2000/01/rdf-schema#Class"/>' in ent


def test_ontology_graphml_export(tmp_path):
    """GraphML export parity (reference show_ontology_structure(to_disk),
    _ontology.py:819-856): same filename, full multi-parent hierarchy."""
    import networkx as nx

    from biocypher_spark.mapping import SchemaMapping
    from biocypher_spark.ontology import Ontology

    onto = Ontology(
        SchemaMapping(schema={}),
        parent_map={"protein": "polypeptide", "polypeptide": "named thing", "gene": "named thing"},
    )
    path = onto.write_graphml(str(tmp_path))
    assert path.endswith("ontology_structure.graphml")
    g = nx.read_graphml(path)
    assert set(g.nodes) >= {"protein", "polypeptide", "named thing", "gene"}
    assert ("protein", "polypeptide") in g.edges


def test_rdf_writer_jsonld_colliding_sanitized_keys(spark, translator, tmp_path):
    """Two raw prop keys that sanitize to the same IRI-safe name must not
    build a duplicate-key map (Spark's default mapKeyDedupPolicy=EXCEPTION
    errors the whole label write); first entry wins, write succeeds."""
    import json

    nodes = spark.createDataFrame(
        [("p1", "protein", {"retail price": "a", "retail_price": "b", "name": "n"})],
        "node_id string, node_label string, props map<string,string>",
    )
    w = RDFWriter(spark, translator, str(tmp_path / "j"), rdf_format="json-ld")
    w.write_nodes(nodes)
    doc = json.loads(read(tmp_path / "j" / "Protein.jsonld"))
    g = doc["@graph"][0]
    assert g["bc:name"] == "n"
    assert g["bc:retail_price"] in ("a", "b")  # exactly one survives
    assert sum(1 for k in g if k == "bc:retail_price") == 1


def test_rdf_null_props_and_falsy_values(spark, translator, tmp_path):
    """A NULL props map must not delete the node's rdf:type triple, and
    None/empty property values are skipped (reference guards every
    property write with `if value:`)."""
    from biocypher_spark.model import NODE_SCHEMA

    nodes = spark.createDataFrame(
        [
            ("n1", "protein", "id", None, 0),
            ("n2", "protein", "id", {"name": '"x"', "desc": "null", "empty": '""'}, 1),
        ],
        NODE_SCHEMA,
    )
    out = tmp_path / "nt"
    RDFWriter(spark, translator, str(out)).write_nodes(nodes)
    nt = read(out / "Protein.nt")
    assert "#n1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>" in nt
    assert '"None"' not in nt and '""' not in nt.replace('\\"', "")
    assert '#name> "x" .' in nt


def test_rdf_label_sanitized_in_iris(spark, translator, tmp_path):
    """Labels with IRI-hostile characters must not corrupt IRIs or XML
    element names."""
    from biocypher_spark.model import NODE_SCHEMA

    nodes = spark.createDataFrame(
        [("n1", "gene (human)", "id", {"name": '"x"'}, 0)], NODE_SCHEMA
    )
    out = tmp_path / "x"
    RDFWriter(spark, translator, str(out), rdf_format="xml").write_nodes(nodes)
    import xml.etree.ElementTree as ET

    fname = [f for f in os.listdir(out) if f.endswith(".xml")][0]
    xml = read(out / fname)
    ET.fromstring(xml)  # parses only if the element names are legal
    assert " (" not in xml.split("rdf:type")[1].split("/>")[0]


def test_turtle_nt_same_local_names(spark, translator, tmp_path):
    """One entity id must map to ONE IRI local name across formats
    (the turtle path previously used a narrower charset)."""
    from biocypher_spark.model import NODE_SCHEMA

    nodes = spark.createDataFrame(
        [("uniprot:P05067", "protein", "id", {"name": '"x"'}, 0)], NODE_SCHEMA
    )
    RDFWriter(spark, translator, str(tmp_path / "nt")).write_nodes(nodes)
    RDFWriter(spark, translator, str(tmp_path / "ttl"), rdf_format="turtle").write_nodes(nodes)
    nt = read(tmp_path / "nt" / "Protein.nt")
    ttl = read(tmp_path / "ttl" / "Protein.ttl")
    assert "#uniprot:P05067>" in nt
    assert "bc:uniprot:P05067 " in ttl


def test_owl_rejects_unsupported_format(spark, translator, tmp_path):
    import pytest as _pytest

    from biocypher_spark.writer.owl import OWLWriter

    with _pytest.raises(ValueError, match="ntriples.*turtle"):
        OWLWriter(spark, translator, str(tmp_path), rdf_format="xml")


def test_owl_multi_parent_subclassof(spark, tmp_path):
    """subClassOf vocabulary follows the REAL parent DAG: multi-parent
    labels emit one edge per parent, never a fabricated edge between an
    ancestor and an unrelated sibling branch."""
    from biocypher_spark.mapping import SchemaMapping
    from biocypher_spark.model import nodes_from_tuples
    from biocypher_spark.ontology import Ontology
    from biocypher_spark.translate import SparkTranslator
    from biocypher_spark.writer.owl import OWLWriter

    onto = Ontology(
        mapping=SchemaMapping(schema={"protein": {"represented_as": "node", "input_label": "protein"}}),
        parent_map={"protein": ["a", "b"], "a": ["root"], "b": ["root"]},
    )
    tr = SparkTranslator(spark, onto)
    w = OWLWriter(spark, tr, str(tmp_path), rdf_format="turtle")
    w.write_nodes(tr.translate_nodes(nodes_from_tuples(spark, [("p1", "protein", {})])).nodes)
    vocab = "\n".join(w._vocab)
    assert "bc:Protein rdfs:subClassOf bc:A ." in vocab
    assert "bc:Protein rdfs:subClassOf bc:B ." in vocab
    assert "bc:A rdfs:subClassOf bc:Root ." in vocab
    assert "bc:Root rdfs:subClassOf bc:B ." not in vocab
