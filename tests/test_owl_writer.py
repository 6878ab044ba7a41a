"""S9 OWL writer tests: single merged file, vocabulary + NamedIndividual
instances, both edge models (reference _owl.py:21-567 semantics)."""

import pytest

from biocypher_spark.mapping import SchemaMapping
from biocypher_spark.model import edges_from_tuples, nodes_from_tuples
from biocypher_spark.ontology import NullOntology, Ontology
from biocypher_spark.translate import SparkTranslator
from biocypher_spark.writer.owl import OWLWriter
from fixtures.data_generator import perturbed_edges, protein_nodes


@pytest.fixture()
def translator(spark, schema_path):
    # real ancestor chain so the vocabulary section has subClassOf triples
    onto = Ontology(
        SchemaMapping(schema_path),
        parent_map={"protein": "polypeptide", "polypeptide": "biological entity"},
    )
    return SparkTranslator(spark, onto)


def read(p):
    with open(p) as fh:
        return fh.read()


def write_graph(spark, translator, outdir, **kw):
    w = OWLWriter(spark, translator, str(outdir), **kw)
    nodes = translator.translate_nodes(nodes_from_tuples(spark, protein_nodes(2))).nodes
    edges = translator.translate_edges(edges_from_tuples(spark, perturbed_edges(3)[1:])).edges
    w.write_nodes(nodes)
    assert w.output_path is None  # nothing emitted until BOTH calls happened
    w.write_edges(edges)
    assert w.output_path is not None
    return w, read(w.output_path)


def test_owl_association_ntriples(spark, translator, tmp_path):
    w, owl = write_graph(spark, translator, tmp_path)
    ns = "https://biocypher.org/biocypher#"
    owlns = "http://www.w3.org/2002/07/owl#"
    rdfsns = "http://www.w3.org/2000/01/rdf-schema#"
    # vocabulary: ancestor chain under the used label
    assert f"<{ns}Protein> <{rdfsns}subClassOf> <{ns}Polypeptide> ." in owl
    assert f"<{ns}Polypeptide> <{rdfsns}subClassOf> <{ns}BiologicalEntity> ." in owl
    assert f"<{ns}Protein> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{owlns}Class> ." in owl
    # node instances: class type + NamedIndividual + rdfs:label
    assert f"<{ns}p1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{ns}Protein> ." in owl
    assert f"<{ns}p1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{owlns}NamedIndividual> ." in owl
    assert f'<{ns}p1> <{rdfsns}label> "p1" .' in owl
    assert '"StringProperty1" .' in owl
    # association model: edge instance typed by the edge class, linked via
    # edge_source / edge_target which are subPropertyOf edge
    assert f"<{ns}edge_source> <{rdfsns}subPropertyOf> <{ns}edge> ." in owl
    assert f"<{ns}edge> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{owlns}ObjectProperty> ." in owl
    assert f"<{ns}PERTURBED_IN_DISEASE> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{owlns}Class> ." in owl
    assert f"<{ns}edge_source> <" in owl and f"<{ns}edge_target> <" in owl
    # single merged file
    assert w.output_path.endswith("biocypher.nt")


def test_owl_object_property_model(spark, translator, tmp_path):
    w, owl = write_graph(spark, translator, tmp_path, edge_model="ObjectProperty")
    ns = "https://biocypher.org/biocypher#"
    owlns = "http://www.w3.org/2002/07/owl#"
    # direct triple, no association instances
    assert f"<{ns}PERTURBED_IN_DISEASE> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{owlns}ObjectProperty> ." in owl
    assert "edge_source" not in owl and "edge_target" not in owl
    import re

    assert re.search(rf"<{ns}p\d+> <{ns}PERTURBED_IN_DISEASE> <{ns}p\d+> \.", owl)


def test_owl_turtle_prefixed(spark, translator, tmp_path):
    w, owl = write_graph(spark, translator, tmp_path, rdf_format="turtle")
    assert owl.startswith("@prefix bc: <https://biocypher.org/biocypher#> .")
    assert "@prefix owl: <http://www.w3.org/2002/07/owl#> ." in owl
    assert "bc:Protein rdfs:subClassOf bc:Polypeptide ." in owl
    assert "bc:p1 rdf:type owl:NamedIndividual ." in owl
    assert w.output_path.endswith("biocypher.ttl")


def test_owl_bad_edge_model(spark, schema_path, tmp_path):
    tr = SparkTranslator(spark, NullOntology(SchemaMapping(schema_path)))
    with pytest.raises(ValueError, match="edge_model"):
        OWLWriter(spark, tr, str(tmp_path), edge_model="nope")


def test_owl_edge_without_id_gets_synthetic_instance(spark, translator, tmp_path):
    """Edges lacking a relationship id get {src}--{label}--{tgt} instances
    (reference _owl.py:419-423)."""
    from pyspark.sql import functions as F

    w = OWLWriter(spark, translator, str(tmp_path))
    nodes = translator.translate_nodes(nodes_from_tuples(spark, protein_nodes(1))).nodes
    edges = translator.translate_edges(edges_from_tuples(spark, perturbed_edges(2)[1:])).edges
    edges = edges.withColumn("relationship_id", F.lit(None).cast("string"))
    w.write_nodes(nodes)
    w.write_edges(edges)
    owl = read(w.output_path)
    assert "--PERTURBED_IN_DISEASE--" in owl
