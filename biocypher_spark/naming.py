"""Label case conversion and sanitization utilities.

Pure-Python, driver-side only: labels form a small domain (the classes of a
schema_config), so these functions are applied to the label dictionary once
and broadcast — never per row.

Semantics match the reference BioCypher string utilities
(/root/reference/biocypher/_misc.py:141-240, adapted there from the Biolink
Model Toolkit) and the Neo4j label sanitizer
(/root/reference/biocypher/output/write/_batch_writer.py:1240-1277).
Implementation is original.
"""

from __future__ import annotations

import re

_CAMEL_BOUNDARY = re.compile(r"(?<!^)(?=[A-Z][a-z])")
_LOWER_WORD = re.compile(r"[a-zA-Z]*[a-z][a-zA-Z]*")


def pascalcase_to_sentencecase(s: str) -> str:
    """``PascalCase`` -> ``pascal case``; all-caps runs are preserved."""
    spaced = _CAMEL_BOUNDARY.sub(" ", s)
    return _LOWER_WORD.sub(lambda m: m.group(0).lower(), spaced)


def snakecase_to_sentencecase(s: str) -> str:
    """``snake_case`` -> ``snake case``."""
    return " ".join(w.lower() for w in s.split("_"))


def sentencecase_to_snakecase(s: str) -> str:
    """``sentence case`` -> ``sentence_case``."""
    return "_".join(s.lower().split())


def sentencecase_to_pascalcase(s: str, sep: str = r"\s") -> str:
    """``sentence case`` -> ``SentenceCase``.

    Only the first letter of each separator-delimited word is upper-cased;
    the rest of the word is untouched, so ``microRNA`` -> ``MicroRNA`` and an
    already-UPPER label like ``PERTURBED_IN_DISEASE`` passes through
    unchanged (no spaces to split on).
    """
    return re.sub(
        r"(?:^|[" + sep + r"])([a-zA-Z])",
        lambda m: m.group(1).upper(),
        s,
    )


def sentence_to_pascal(name: str) -> str:
    """Sentence-case label (possibly dotted for virtual leaves) -> PascalCase.

    Dotted labels are converted per segment: ``reactome.pathway`` ->
    ``Reactome.Pathway`` (reference: ``Translator.name_sentence_to_pascal``,
    /root/reference/biocypher/_translate.py:481-490).
    """
    if "." in name:
        return ".".join(sentencecase_to_pascalcase(p) for p in name.split("."))
    return sentencecase_to_pascalcase(name)


def to_lower_sentence_case(s: str) -> str:
    """Any of snake_case / PascalCase / sentence case -> lower sentence case."""
    if "_" in s:
        return snakecase_to_sentencecase(s)
    if " " in s:
        return s.lower()
    if s and s[0].isupper():
        return pascalcase_to_sentencecase(s)
    return s


_ALLOWED = re.compile(r"[a-zA-Z0-9_$ .]")


def parse_label(label: str) -> str:
    """Strip characters Neo4j label names cannot contain.

    Keeps ``[a-zA-Z0-9_$ .]``; drops leading characters until one that is
    alphabetic or ``$`` — but when NO such character exists the compliant
    characters are kept as-is (reference: the rescan loop never fires and
    ``matches`` is returned unchanged, so '123' stays '123' rather than
    collapsing to '' — distinct all-numeric labels must not merge into one
    placeholder file). Returns ``""`` only when nothing survives the
    charset filter. (Reference semantics: ``parse_label``,
    /root/reference/biocypher/output/write/_batch_writer.py:1240-1277.)
    """
    kept = _ALLOWED.findall(label)
    if not kept:
        return ""
    start = 0
    if not (kept[0].isalpha() or kept[0] == "$"):
        for i, c in enumerate(kept):
            if c.isalpha() or c == "$":
                start = i
                break
    return "".join(kept[start:]).strip()


def to_list(value) -> list:
    """Normalize a scalar-or-list schema field to a list."""
    if value is None:
        return []
    if isinstance(value, (list, tuple, set)):
        return list(value)
    return [value]
