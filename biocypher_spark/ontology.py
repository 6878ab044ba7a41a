"""Ontology layer: ancestor closures for multi-label `:LABEL` strings.

The reference builds a networkx DAG from an OWL/TTL file via rdflib
(/root/reference/biocypher/_ontology.py:92-176) and falls back to a headless
``NullOntology`` whose ``get_ancestors(label) == [label]``
(/root/reference/biocypher/_ontology.py:899-949).

This module is driver-side only: the DAG is tiny (schema classes plus an
optional local hierarchy file), so we compute the transitive ancestor list
per label once and *broadcast* the resulting ``dict[label, list[label]]`` to
executors. rdflib is not available in this sandbox and network fetches are
forbidden, so hierarchy input is either:

  * nothing (headless mode — the sane default), or
  * a ``parent_map`` dict / YAML file ``{child: parent | [parents]}``, or
  * a minimal Turtle file containing ``rdfs:subClassOf`` triples with
    ``rdfs:label`` names (enough for the bundled test ontologies' shape).

Schema classes with ``is_a`` chains are grafted onto the DAG exactly like the
reference's ``_extend_ontology`` (/root/reference/biocypher/_ontology.py:
649-705), and ``synonym_for`` renames ontology nodes to schema keys
(/root/reference/biocypher/_ontology.py:733-751).
"""

from __future__ import annotations

from typing import Iterable, Optional

import yaml

from .mapping import SchemaMapping
from .naming import to_list, to_lower_sentence_case


class NullOntology:
    """Headless ontology: every label is its own only ancestor."""

    def __init__(self, mapping: Optional[SchemaMapping] = None):
        self.mapping = mapping or SchemaMapping()

    def has_node(self, label: str) -> bool:
        return False

    def get_ancestors(self, label: str) -> list[str]:
        return [label]

    def ancestor_map(self, labels: Iterable[str]) -> dict[str, list[str]]:
        return {lab: [lab] for lab in labels}


def hybrid_ontology(
    mapping: Optional[SchemaMapping],
    head_ontology: dict,
    tail_ontologies: Optional[dict] = None,
) -> "Ontology":
    """The reference's dict-config ontology front door (reference
    ``Ontology.__init__``/``_main``, /root/reference/biocypher/_ontology.py:
    480-565): load the head ontology file, graft each tail ontology's
    subtree at its join nodes, THEN apply schema synonyms/extensions to the
    combined DAG.

    ``head_ontology``: {"url", "root_node", "format"?,
    "switch_label_and_id"?}. ``tail_ontologies``: {name: {"url",
    "head_join_node", "tail_join_node", "format"?, "merge_nodes"?,
    "switch_label_and_id"?}} — the tail is loaded rooted at its
    tail_join_node, so the grafted subtree is exactly the reference's
    dfs subtree."""
    head = Ontology(
        mapping=None,
        hierarchy_file=head_ontology["url"],
        root=head_ontology.get("root_node"),
        switch_label_and_id=head_ontology.get("switch_label_and_id", True),
        file_format=head_ontology.get("format"),
    )
    head_switched = head_ontology.get("switch_label_and_id", True)
    for conf in (tail_ontologies or {}).values():
        tail = Ontology(
            mapping=None,
            hierarchy_file=conf["url"],
            root=conf.get("tail_join_node"),
            switch_label_and_id=conf.get("switch_label_and_id", True),
            file_format=conf.get("format"),
        )

        def resolve(onto: "Ontology", raw_label: str, switched: bool) -> Optional[str]:
            norm = to_lower_sentence_case(raw_label.replace("_", " "))
            if switched:
                if norm in onto._parents:
                    return norm
                if raw_label in onto._parents:
                    # YAML hierarchies keep raw keys (no label switching
                    # happened at load time) — honor the configured name
                    return raw_label
                # fall through: a label match resolves to the node id
            return onto._find_node_by_label(norm)

        head_join = resolve(head, conf["head_join_node"], head_switched)
        if head_join is None or head_join not in head._parents:
            # name the user's CONFIGURED value when resolve() missed (it
            # returns None on a label miss, and "'None' not found" would
            # misdirect a label typo into looking structural); message
            # shape otherwise mirrors the reference's
            shown = head_join if head_join is not None else conf["head_join_node"]
            raise ValueError(
                f"Head join node '{shown}' not found in head ontology. "
                f"The head ontology contains the following nodes: {list(head._parents)}."
            )
        tail_join = resolve(tail, conf["tail_join_node"], conf.get("switch_label_and_id", True))
        if tail_join is None:
            raise ValueError(
                f"Tail join node '{conf['tail_join_node']}' not found in tail "
                f"ontology '{conf['url']}' (no node with that label)."
            )
        head.graft(tail, head_join, tail_join, merge_nodes=conf.get("merge_nodes", True))
    if mapping is not None:
        head.mapping = mapping
        head._apply_synonyms()
        head._extend_with_schema()
    return head


class Ontology:
    """DAG of child -> parents edges with schema extension and synonyms."""

    def __init__(
        self,
        mapping: Optional[SchemaMapping] = None,
        parent_map: Optional[dict] = None,
        hierarchy_file: Optional[str] = None,
        root: Optional[str] = None,
        switch_label_and_id: bool = True,
        file_format: Optional[str] = None,
        remove_prefixes: bool = True,
    ):
        self.mapping = mapping or SchemaMapping()
        self._parents: dict[str, list[str]] = {}
        self._labels: dict[str, str] = {}
        file_root_applied = False
        if hierarchy_file:
            fmt = (file_format or "").lower()
            # ANY explicit non-YAML format routes to the RDF reader so an
            # unsupported value hits parse_rdf_file's clear format error
            # instead of falling into yaml.safe_load of a Turtle/XML file
            is_rdf = (
                (fmt and fmt not in ("yaml", "yml"))
                or (not fmt and hierarchy_file.lower().endswith((".ttl", ".owl", ".rdf", ".xml")))
                or (not fmt and self._sniff_rdf(hierarchy_file))
            )
            if is_rdf:
                self._load_rdf(hierarchy_file, root, switch_label_and_id, file_format, remove_prefixes)
                file_root_applied = root is not None
            else:
                with open(hierarchy_file) as fh:
                    parent_map = {**(yaml.safe_load(fh) or {}), **(parent_map or {})}
        for child, parents in (parent_map or {}).items():
            self._add_edges(child, to_list(parents))
        # root restriction FIRST, matching the RDF path (where the filter
        # runs inside build_ontology_graph before synonyms/schema): schema
        # classes grafted below the root by their is_a chain must survive,
        # and the reference likewise restricts the loaded vocabulary before
        # extending it with the user schema
        if root is not None and not file_root_applied:
            self._restrict_to_root(root)
        self._apply_synonyms()
        self._extend_with_schema()

    # -- construction ------------------------------------------------------

    def _add_edges(self, child: str, parents: list[str]) -> None:
        cur = self._parents.setdefault(child, [])
        for p in parents:
            if p is not None and p != child and p not in cur:
                cur.append(p)
            if p is not None:
                self._parents.setdefault(p, [])

    @staticmethod
    def _sniff_rdf(path: str) -> bool:
        """True when an extensionless hierarchy file is RDF (XML or Turtle)."""
        from .rdfio import looks_like_rdf_text

        try:
            with open(path, encoding="utf-8", errors="replace") as fh:
                head = fh.read(4000)
        except OSError:
            return False
        return looks_like_rdf_text(head)

    def _load_rdf(
        self,
        path: str,
        root: Optional[str],
        switch_label_and_id: bool,
        file_format: Optional[str],
        remove_prefixes: bool,
    ) -> None:
        """Load an OWL/TTL hierarchy file via the stdlib RDF reader.

        Reproduces the reference's OntologyAdapter semantics
        (/root/reference/biocypher/_ontology.py:92-360): subClassOf /
        subPropertyOf / type-Class / type-ObjectProperty edges gated on
        rdfs:label, owl:intersectionOf expansion, label normalisation with
        id/label switching, and root-descendant filtering. Raises when the
        file parses to zero hierarchy edges — a silently empty ontology
        corrupts every downstream `:LABEL` closure.
        """
        from .rdfio import ZeroHierarchyEdgesError, build_ontology_graph, parse_rdf_file

        triples = parse_rdf_file(path, file_format)
        try:
            parents, labels = build_ontology_graph(
                triples,
                root_label=root,
                switch_label_and_id=switch_label_and_id,
                remove_prefixes=remove_prefixes,
            )
        except ZeroHierarchyEdgesError as exc:
            raise ValueError(
                f"Ontology file {path!r} produced no hierarchy edges ({exc}). "
                "Check the file format or pass file_format= explicitly."
            ) from exc
        self._labels.update(labels)
        for child, ps in parents.items():
            self._add_edges(child, ps)

    def node_label(self, node: str) -> Optional[str]:
        """The stored label attribute for a file-loaded node (reference
        keeps the un-switched half of the id/label pair as the node's
        'label' attribute, _ontology.py:335-342)."""
        return self._labels.get(node)

    def _find_node_by_label(self, normalized_label: str) -> Optional[str]:
        """Node id whose stored label attribute equals the normalized label
        (used to resolve join nodes when ids are IRI locals,
        switch_label_and_id=False — reference _get_head_join_node,
        _ontology.py:578-589)."""
        for node, lbl in self._labels.items():
            if lbl == normalized_label:
                return node
        return None

    def _apply_synonyms(self) -> None:
        """Rename ontology nodes to schema keys declared via ``synonym_for``.

        Matches ``nx.relabel_nodes`` merge semantics (the reference's
        mechanism): when the rename target already exists as a node, the
        two nodes MERGE — parent edges union rather than the later dict
        entry silently overwriting the earlier one. Label attributes follow
        the rename."""
        renames = self._synonym_renames()
        if not renames:
            return
        new: dict[str, list[str]] = {}
        for child, parents in self._parents.items():
            tgt = renames.get(child, child)
            cur = new.setdefault(tgt, [])
            for p in parents:
                rp = renames.get(p, p)
                if rp != tgt and rp not in cur:
                    cur.append(rp)
        self._parents = new
        if self._labels:
            self._labels = {renames.get(n, n): lbl for n, lbl in self._labels.items()}

    def _extend_with_schema(self) -> None:
        """Append schema classes' ``is_a`` chains as DAG edges.

        A chain ``[a, b, c]`` for class ``k`` adds ``k->a->b->c``; the chain
        is expected to bottom out at an existing ontology node when a
        hierarchy is loaded (reference errors there; we are permissive and
        attach the chain regardless, which reduces to headless semantics).
        """
        for cls, conf in self.mapping.extended_schema.items():
            chain = to_list(conf.get("is_a"))
            if not chain:
                if cls not in self._parents:
                    if self._labels and not conf.get("synonym_for"):
                        # a real vocabulary was file-loaded: a schema class
                        # that is neither in it nor declares inheritance is
                        # a spelling/config error (reference
                        # _extend_ontology, _ontology.py:659-676)
                        raise ValueError(
                            f"Class `{cls}` not found in ontology, but also has no inheritance "
                            "definition. Please check your schema for spelling errors, first "
                            "letter not in lower case, use of underscores, a missing `is_a` "
                            "definition (SubClassOf a root node), or missing labels in class "
                            "or super-classes."
                        )
                    self._parents.setdefault(cls, [])
                continue
            prev = cls
            for parent in chain:
                if parent not in to_list(self._parents.get(prev)):
                    self._add_edges(prev, [parent])
                prev = parent

    def _synonym_renames(self) -> dict[str, str]:
        """ontology-name -> schema-key renames declared via ``synonym_for``."""
        renames = {}
        for cls, conf in self.mapping.extended_schema.items():
            syn = conf.get("synonym_for")
            if syn and syn in self._parents:
                renames[syn] = cls
        return renames

    def _restrict_to_root(self, root: str) -> None:
        """Keep only nodes whose ancestor closure includes ``root``.

        Restriction runs BEFORE ``_apply_synonyms``, so a root given under
        its post-synonym (schema-key) name is resolved back to the loaded
        ontology name first. A root matching no node raises rather than
        silently emptying the vocabulary (an empty keep-set would drop
        every class and every downstream label closure with no signal)."""
        if root not in self._parents:
            for src, tgt in self._synonym_renames().items():
                if tgt == root:
                    root = src
                    break
        if root not in self._parents:
            raise ValueError(
                f"root node {root!r} not found in the loaded ontology "
                "(checked both its own name and synonym_for sources)"
            )
        keep = {n for n in self._parents if root in self.get_ancestors(n)}
        self._parents = {n: [p for p in ps if p in keep] for n, ps in self._parents.items() if n in keep}

    # -- hybridisation (O3) --------------------------------------------------

    def graft(
        self,
        tail: "Ontology",
        head_join_node: str,
        tail_join_node: str,
        merge_nodes: bool = True,
    ) -> None:
        """Graft a tail ontology's subtree onto this one at a join node.

        ``merge_nodes=True`` renames the tail join node into the head join
        node (single merged node); ``False`` attaches the tail join node as
        a child of the head join node (reference ``_join_ontologies``,
        /root/reference/biocypher/_ontology.py:606-647).
        """
        if head_join_node not in self._parents:
            raise ValueError(f"head join node {head_join_node!r} not in ontology")
        if tail_join_node not in tail._parents:
            raise ValueError(f"tail join node {tail_join_node!r} not in tail ontology")
        # descendants of the tail join node (children-of relation inverted)
        children: dict[str, list[str]] = {}
        for child, parents in tail._parents.items():
            for p in parents:
                children.setdefault(p, []).append(child)
        keep = set()
        stack = [tail_join_node]
        while stack:
            n = stack.pop()
            if n in keep:
                continue
            keep.add(n)
            stack.extend(children.get(n, []))

        def rename(n: str) -> str:
            return head_join_node if (merge_nodes and n == tail_join_node) else n

        for child in keep:
            for p in tail._parents.get(child, []):
                if p in keep:
                    self._add_edges(rename(child), [rename(p)])
        # merge labels for GRAFTED nodes only, under their post-rename ids.
        # A blanket tail._labels.update would (a) register labels for tail
        # nodes outside the grafted subtree (nonexistent in this DAG) and
        # (b) with merge_nodes keep the merged-away tail join id alive —
        # a later multi-tail graft resolving a join label through
        # _find_node_by_label would then land on a dead node id and raise
        # a spurious "not found". When both sides label the merged join
        # node the tail's label wins, matching the reference's
        # nx.compose(head, renamed_tail) attribute policy (second graph's
        # attributes overwrite; _ontology.py:606-647).
        for n in keep:
            lbl = tail._labels.get(n)
            if lbl is not None:
                self._labels[rename(n)] = lbl
        if not merge_nodes:
            self._add_edges(tail_join_node, [head_join_node])

    # -- visualisation (O6) ----------------------------------------------------

    def to_networkx(self):
        """Ontology hierarchy as a networkx DiGraph (child -> parent edges),
        including multiple inheritance that the ASCII tree flattens."""
        import networkx as nx

        g = nx.DiGraph()
        for child, parents in self._parents.items():
            # file-loaded ontologies carry the un-switched half of the
            # id/label pair in _labels — preserve it as the node's label
            # attribute like the reference; headless nodes label as self
            g.add_node(child, label=self._labels.get(child, child))
            for p in parents:
                g.add_edge(child, p)
        return g

    def write_graphml(self, to_disk: str) -> str:
        """GraphML export of the hierarchy (reference
        ``show_ontology_structure(to_disk=...)``,
        /root/reference/biocypher/_ontology.py:819-856 via nx.write_graphml;
        same file name ``ontology_structure.graphml``). Returns the path."""
        import os

        import networkx as nx

        g = self.to_networkx()
        os.makedirs(to_disk, exist_ok=True)
        path = os.path.join(to_disk, "ontology_structure.graphml")
        nx.write_graphml(g, path)
        return path

    def tree_string(self, root: Optional[str] = None) -> str:
        """ASCII tree of the DAG (reference uses treelib,
        /root/reference/biocypher/_ontology.py:767-856; treelib is not
        available here so this renders directly)."""
        children: dict[str, list[str]] = {}
        roots = []
        for child, parents in sorted(self._parents.items()):
            if not parents:
                roots.append(child)
            for p in parents:
                children.setdefault(p, []).append(child)
        if root is not None:
            roots = [root]
        lines: list[str] = []

        def walk(node: str, prefix: str, seen: frozenset):
            lines.append(prefix + node)
            if node in seen:
                return
            for c in sorted(children.get(node, [])):
                walk(c, prefix + "    ", seen | {node})

        for r in roots:
            walk(r, "", frozenset())
        return "\n".join(lines)

    # -- queries -----------------------------------------------------------

    def has_node(self, label: str) -> bool:
        return label in self._parents

    def get_ancestors(self, label: str) -> list[str]:
        """DFS preorder from ``label`` following child->parent edges.

        Specific -> generic order, self first; matches the reference's
        ``nx.dfs_tree`` traversal (_ontology.py:753-765). Unknown labels
        raise ``KeyError`` (callers fall back to ``[label]`` like the
        reference catches NetworkXError).
        """
        if label not in self._parents:
            raise KeyError(label)
        out: list[str] = []
        seen: set[str] = set()
        stack = [label]
        while stack:
            node = stack.pop()
            if node in seen:
                continue
            seen.add(node)
            out.append(node)
            # push parents in reverse so the first parent is visited first
            stack.extend(reversed(self._parents.get(node, [])))
        return out

    def ancestor_map(self, labels: Iterable[str]) -> dict[str, list[str]]:
        """Per-label ancestor lists (fallback ``[label]``), broadcast-ready."""
        out = {}
        for lab in labels:
            try:
                out[lab] = self.get_ancestors(lab)
            except KeyError:
                out[lab] = [lab]
        return out

    def nodes(self) -> list[str]:
        return list(self._parents)
