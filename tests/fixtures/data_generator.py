"""Deterministic synthetic node/edge tuples matching the reference fixture
shapes (/root/reference/test/fixtures/data_generator.py:6-142) so parity
assertions use identical inputs. Original implementation."""

from __future__ import annotations


def protein_nodes(n: int) -> list[tuple]:
    return [
        (
            f"p{i + 1}",
            "protein",
            {
                "score": 4 / (i + 1),
                "name": "StringProperty1",
                "taxon": 9606,
                "genes": ["gene1", "gene2"],
            },
        )
        for i in range(n)
    ]


def mirna_nodes(n: int) -> list[tuple]:
    return [
        (f"m{i + 1}", "mirna", {"name": "StringProperty1", "taxon": 9606})
        for i in range(n)
    ]


def perturbed_edges(n: int) -> list[tuple]:
    return [
        (
            f"prel{i}",
            f"p{i}",
            f"p{i + 1}",
            "protein_disease",
            {"residue": "T253", "level": 4},
        )
        for i in range(n)
    ]


def mutated_edges(n: int) -> list[tuple]:
    return [
        (
            f"mrel{i}",
            f"m{i}",
            f"p{i + 1}",
            "Gene_Is_Mutated_In_Cell_Tissue",
            {"site": "3-UTR", "confidence": 1},
        )
        for i in range(n)
    ]


def rel_as_node_edges(n: int) -> list[tuple]:
    """post_translational 5-tuples with own ids (rel-as-node class)."""
    return [
        (
            f"i{i + 1}",
            f"p{i + 1}",
            f"p{i + 2}",
            "post_translational",
            {"directed": True, "effect": -1},
        )
        for i in range(n)
    ]
