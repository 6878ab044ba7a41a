"""dbms-string -> writer class registry.

Reference: ``DBMS_TO_CLASS`` / ``get_writer`` (/root/reference/biocypher/
output/write/_get_writer.py:31-96), including the case/alias variants. The
reference's in-memory-backed "writers" (csv/pandas/tabular, networkx, airr)
are dict-of-DataFrame / driver-side structures here, surfaced through the
facade's ``write_csv`` / ``to_df`` / ``to_networkx`` and
``biocypher_spark.airr.AirrKG`` — requesting them as a dbms raises with that
pointer instead of returning a half-compatible object.
"""

from __future__ import annotations

import inspect

from .arango import ArangoDBBatchWriter
from .biopathnet import BioPathNetWriter
from .neo4j import Neo4jBatchWriter
from .owl import OWLWriter
from .postgres import PostgresBatchWriter, SQLiteBatchWriter
from .rdf import RDFWriter

DBMS_TO_CLASS = {
    "neo": Neo4jBatchWriter,
    "neo4j": Neo4jBatchWriter,
    "Neo4j": Neo4jBatchWriter,
    "postgres": PostgresBatchWriter,
    "postgresql": PostgresBatchWriter,
    "PostgreSQL": PostgresBatchWriter,
    "arango": ArangoDBBatchWriter,
    "arangodb": ArangoDBBatchWriter,
    "ArangoDB": ArangoDBBatchWriter,
    "sqlite": SQLiteBatchWriter,
    "sqlite3": SQLiteBatchWriter,
    "rdf": RDFWriter,
    "RDF": RDFWriter,
    "owl": OWLWriter,
    "OWL": OWLWriter,
    "biopathnet": BioPathNetWriter,
    "BioPathNet": BioPathNetWriter,
}

# reference dbms names whose sink is the in-memory KG here
IN_MEMORY_DBMS = {
    "csv": "BioCypherSpark.write_csv()",
    "pandas": "BioCypherSpark.to_df()",
    "tabular": "BioCypherSpark.to_df()",
    "networkx": "BioCypherSpark.to_networkx()",
    "airr": "biocypher_spark.airr.AirrKG",
}


def get_writer(dbms: str, spark, translator, output_directory: str, **kwargs):
    """Instantiate the writer for ``dbms``; constructor kwargs the class does
    not declare are dropped (the writers have heterogeneous signatures)."""
    alias = IN_MEMORY_DBMS.get(dbms.lower())
    if alias:
        raise ValueError(
            f"dbms {dbms!r} is an in-memory sink in biocypher_spark — use {alias}"
        )
    cls = DBMS_TO_CLASS.get(dbms)
    if cls is None:
        raise ValueError(
            f"unknown dbms {dbms!r}; available: {', '.join(sorted(set(DBMS_TO_CLASS)))}"
        )
    sig = inspect.signature(cls.__init__)
    if not any(p.kind == p.VAR_KEYWORD for p in sig.parameters.values()):
        kwargs = {k: v for k, v in kwargs.items() if k in sig.parameters}
    return cls(spark, translator, output_directory, **kwargs)
