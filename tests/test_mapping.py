"""Schema compiler parity tests (mirror of reference test_mapping.py)."""

import warnings

from biocypher_spark.mapping import SchemaMapping
from biocypher_spark.naming import (
    parse_label,
    pascalcase_to_sentencecase,
    sentence_to_pascal,
    sentencecase_to_snakecase,
    to_lower_sentence_case,
)


def test_virtual_leaves(schema_path):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        m = SchemaMapping(schema_path)
    ext = m.extended_schema
    # multi-preferred_id virtual leaves (reference test_mapping.py:14-16)
    assert "reactome.pathway" in ext
    assert "wikipathways.pathway" in ext
    assert ext["reactome.pathway"]["virtual"] is True
    assert ext["reactome.pathway"]["is_a"] == "pathway"
    assert ext["reactome.pathway"]["input_label"] == "reactome"
    assert ext["reactome.pathway"]["preferred_id"] == "reactome"
    # parent remains
    assert "pathway" in ext
    # source-list virtual leaves
    assert "known.sequence variant.variant to gene association" in ext
    assert "somatic.sequence variant.variant to gene association" in ext
    # multi-inheritance prepend for virtual leaves of is_a classes
    dsdna = ext["intact.dsDNA sequence"]
    assert dsdna["is_a"][0] == "dsDNA sequence"
    assert "DNA sequence" in dsdna["is_a"]


def test_property_inheritance(schema_path):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
    m = SchemaMapping(schema_path)
    ext = m.extended_schema
    # dsDNA inherits DNA sequence properties (inherit_properties: true)
    props = ext["dsDNA sequence"]["properties"]
    assert set(props) >= {"ac", "fullName", "shortName", "preferredName", "sequence"}
    # virtual leaves inherit properties too
    assert "properties" in ext["intact.dsDNA sequence"]


def test_self_loop_dropped(schema_path):
    m = SchemaMapping(schema_path)
    assert "gene to variant association" not in m.extended_schema


def test_preferred_id_default():
    m = SchemaMapping(schema={"thing": {"represented_as": "node", "input_label": "thing"}})
    assert m.extended_schema["thing"]["preferred_id"] == "id"


def test_namespace_alias():
    m = SchemaMapping(
        schema={"thing": {"represented_as": "node", "input_label": "thing", "namespace": "xyz"}}
    )
    assert m.extended_schema["thing"]["preferred_id"] == "xyz"


def test_case_conversions():
    assert sentence_to_pascal("post translational interaction") == "PostTranslationalInteraction"
    assert sentence_to_pascal("microRNA") == "MicroRNA"
    assert sentence_to_pascal("PERTURBED_IN_DISEASE") == "PERTURBED_IN_DISEASE"
    assert sentence_to_pascal("reactome.pathway") == "Reactome.Pathway"
    assert pascalcase_to_sentencecase("PostTranslationalInteraction") == "post translational interaction"
    assert sentencecase_to_snakecase("sequence variant") == "sequence_variant"
    assert to_lower_sentence_case("Snake_Case_Label") == "snake case label"
    assert to_lower_sentence_case("PascalCase") == "pascal case"


def test_parse_label():
    assert parse_label("protein") == "protein"
    assert parse_label("(protein)") == "protein"
    assert parse_label("2protein!") == "protein"
    assert parse_label("$special") == "$special"
    assert parse_label("!!!") == ""
    # reference: with NO compliant first character anywhere, the compliant
    # chars are kept as-is — '123' must not collapse to '' (two distinct
    # all-numeric labels would merge into one placeholder file)
    assert parse_label("123") == "123"
