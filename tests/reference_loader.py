"""Load the reference BioCypher writer modules directly from /root/reference
with lightweight stubs for unavailable deps (appdirs/treelib). Used ONLY to
generate reference golden outputs for parity tests — never imported by the
engine itself."""

from __future__ import annotations

import importlib.util
import logging
import sys
import types

REF = "/root/reference/biocypher"


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference():
    """Return a namespace with the reference's create/dedup/mapping/writer
    classes, or None if loading fails."""
    try:
        if "biocypher._logger" not in sys.modules:
            logger_mod = types.ModuleType("biocypher._logger")
            logger_mod.logger = logging.getLogger("refbc")
            sys.modules["biocypher._logger"] = logger_mod
            tree_mod = types.ModuleType("treelib")
            tree_mod.Tree = object
            sys.modules.setdefault("treelib", tree_mod)
            pkg = types.ModuleType("biocypher")
            pkg.__path__ = [REF]
            sys.modules["biocypher"] = pkg
            out_pkg = types.ModuleType("biocypher.output")
            out_pkg.__path__ = [f"{REF}/output"]
            sys.modules["biocypher.output"] = out_pkg
            w_pkg = types.ModuleType("biocypher.output.write")
            w_pkg.__path__ = [f"{REF}/output/write"]
            sys.modules["biocypher.output.write"] = w_pkg
            g_pkg = types.ModuleType("biocypher.output.write.graph")
            g_pkg.__path__ = [f"{REF}/output/write/graph"]
            sys.modules["biocypher.output.write.graph"] = g_pkg

        ns = types.SimpleNamespace()
        _load("biocypher._misc", f"{REF}/_misc.py")
        ns.create = _load("biocypher._create", f"{REF}/_create.py")
        ns.dedup = _load("biocypher._deduplicate", f"{REF}/_deduplicate.py")
        ns.mapping = _load("biocypher._mapping", f"{REF}/_mapping.py")
        # the real _translate pulls more_itertools + rdflib-backed _ontology;
        # the writer only needs the Translator *type* for annotations, so
        # stub the module with FakeRefTranslator
        tr_mod = types.ModuleType("biocypher._translate")
        tr_mod.Translator = FakeRefTranslator
        sys.modules.setdefault("biocypher._translate", tr_mod)
        ns.writer_mod = _load("biocypher.output.write._writer", f"{REF}/output/write/_writer.py")
        ns.batch = _load("biocypher.output.write._batch_writer", f"{REF}/output/write/_batch_writer.py")
        ns.neo4j = _load("biocypher.output.write.graph._neo4j", f"{REF}/output/write/graph/_neo4j.py")
        return ns
    except Exception as exc:  # pragma: no cover
        print(f"reference load failed: {exc}")
        return None


class FakeRefOntology:
    """Headless ontology surface the reference writer expects."""

    def __init__(self, mapping, parent_map=None):
        self.mapping = mapping
        self._parents = parent_map or {}

    def get_ancestors(self, label):
        import networkx as nx

        g = nx.DiGraph()
        g.add_node(label)
        frontier = [label]
        while frontier:
            n = frontier.pop()
            p = self._parents.get(n)
            if p is not None and not g.has_edge(n, p):
                g.add_edge(n, p)
                frontier.append(p)
        if label not in g:
            raise nx.exception.NetworkXError(label)
        return list(nx.dfs_tree(g, label))


class FakeRefTranslator:
    """Translator surface (_get_all_labels / headers) for the reference writer."""

    def __init__(self, mapping, parent_map=None):
        self.ontology = FakeRefOntology(mapping, parent_map)

    @staticmethod
    def name_sentence_to_pascal(name: str) -> str:
        import re

        def conv(s):
            return re.sub(r"(?:^|[\s])([a-zA-Z])", lambda m: m.group(1).upper(), s)

        if "." in name:
            return ".".join(conv(p) for p in name.split("."))
        return conv(name)
