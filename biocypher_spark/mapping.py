"""Schema-config compiler: schema_config.yaml -> extended schema.

This is a driver-side, pure-Python compile whose *semantics* match the
reference BioCypher ``OntologyMapping._extend_schema``
(/root/reference/biocypher/_mapping.py:48-320): vertical property
inheritance, virtual leaves for multi ``preferred_id``/``source`` entries,
deprecated-field renames, and self-loop removal. The result is a small dict
that downstream Spark stages broadcast; it is never evaluated per row.
"""

from __future__ import annotations

import warnings
from typing import Any, Optional

import yaml

from .naming import to_list

_CORE_PID_FIELDS = ("is_a", "preferred_id", "input_label", "represented_as")
_CORE_SRC_FIELDS = ("is_a", "source", "input_label", "represented_as")


class SchemaMapping:
    """Load and extend a BioCypher-style schema configuration.

    Attributes:
        schema: the raw (normalized) yaml dict.
        extended_schema: class name -> config dict, after inheritance and
            virtual-leaf expansion. Insertion order matters downstream
            (later virtual leaves override parent input-label mappings).
    """

    def __init__(self, config_file: Optional[str] = None, schema: Optional[dict] = None):
        if schema is not None:
            self.schema = schema
        elif config_file is not None:
            with open(config_file) as fh:
                self.schema = yaml.safe_load(fh) or {}
        else:
            self.schema = {}
        self.extended_schema = self._extend_schema(self.schema)

    # -- compile ----------------------------------------------------------

    def _extend_schema(self, schema: dict) -> dict:
        extended: dict[str, dict] = {}

        # normalize deprecated / alias fields in place
        for name, conf in schema.items():
            if not isinstance(conf, dict) or "represented_as" not in conf:
                continue
            if conf.get("namespace") is not None:
                conf["preferred_id"] = conf.pop("namespace")
            elif conf.get("preferred_id") is not None:
                warnings.warn(
                    f"'preferred_id' in schema entry '{name}' is deprecated; use 'namespace'.",
                    DeprecationWarning,
                    stacklevel=2,
                )
            else:
                conf["preferred_id"] = "id"
            if conf.get("input_label") is None and conf.get("label_in_input") is not None:
                warnings.warn(
                    f"'label_in_input' in schema entry '{name}' is deprecated; use 'input_label'.",
                    DeprecationWarning,
                    stacklevel=2,
                )
                conf["input_label"] = conf.pop("label_in_input")

        # pass 1: classes directly present in the ontology (no is_a)
        for name, conf in schema.items():
            if not isinstance(conf, dict) or "represented_as" not in conf:
                continue
            if "is_a" not in conf:
                extended[name] = conf

        # pass 2: vertical property inheritance, then is_a classes
        self._inherit_properties(schema)
        for name, conf in schema.items():
            if not isinstance(conf, dict) or "is_a" not in conf:
                continue
            if name == conf["is_a"]:
                # self-loop: drop (reference logs and skips,
                # _mapping.py:102-109)
                continue
            extended[name] = conf

        # pass 3: horizontal inheritance -> virtual leaves
        for name, conf in schema.items():
            if not isinstance(conf, dict) or "represented_as" not in conf:
                continue
            if isinstance(conf.get("preferred_id"), list):
                extended.update(self._virtual_leaves(name, conf, key_field="preferred_id"))
            elif isinstance(conf.get("source"), list):
                extended.update(self._virtual_leaves(name, conf, key_field="source"))

        return extended

    def _inherit_properties(self, schema: dict) -> None:
        """Single-level property inheritance from the ``is_a`` parent.

        Parent properties override the child's on key collision, and parent
        exclude_properties are appended after the child's (reference
        semantics, _mapping.py:132-180).
        """
        for name, conf in schema.items():
            if not isinstance(conf, dict) or "represented_as" not in conf or "is_a" not in conf:
                continue
            if not conf.get("inherit_properties", False):
                continue
            parents = to_list(conf["is_a"])
            parent = parents[0] if parents else None
            if parent is None or parent not in self.schema:
                continue
            conf.setdefault("properties", {})
            conf.setdefault("exclude_properties", [])
            parent_props = self.schema[parent].get("properties", {})
            if parent_props:
                conf["properties"].update(parent_props)
            parent_excl = self.schema[parent].get("exclude_properties")
            if parent_excl:
                merged = to_list(conf["exclude_properties"])
                for p in to_list(parent_excl):
                    if p not in merged:
                        merged.append(p)
                conf["exclude_properties"] = merged

    def _virtual_leaves(self, name: str, conf: dict, key_field: str) -> dict:
        """Create ``{key}.{class}`` children per (preferred_id|source, input_label).

        Reference: _horizontal_inheritance_pid / _horizontal_inheritance_source,
        _mapping.py:182-320.
        """
        keys = conf[key_field]
        labels = conf.get("input_label")
        reps = conf["represented_as"]
        n = max(len(to_list(keys)), len(to_list(labels)), len(to_list(reps)))
        keys_l = keys if isinstance(keys, list) else [keys] * n
        labels_l = labels if isinstance(labels, list) else [labels] * n
        reps_l = reps if isinstance(reps, list) else [reps] * n
        core = _CORE_PID_FIELDS if key_field == "preferred_id" else _CORE_SRC_FIELDS

        leaves: dict[str, dict] = {}
        for key, lab, rep in zip(keys_l, labels_l, reps_l):
            child: dict[str, Any] = {
                key_field: key,
                "input_label": lab,
                "represented_as": rep,
                "virtual": True,
            }
            if "is_a" in conf:
                parents = to_list(conf["is_a"])
                child["is_a"] = [name, *parents]
            else:
                child["is_a"] = name
            for k, v in conf.items():
                if k not in core:
                    child.setdefault(k, v)
            leaves[f"{key}.{name}"] = child
        return leaves
