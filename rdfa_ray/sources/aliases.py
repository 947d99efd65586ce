"""The fixed 50-entity alias table shared by the synthetic transcript
generator (which embeds the surface forms into RDFa fragments) and the
entity linker (which looks them up against literal objects).

Entirely synthetic and deterministic: entity ``E{i}`` has a canonical
IRI plus 2-3 surface forms.  Entity 0 is the designated *hot* entity
(~10% of markup rows reference it — FIXTURES.md §1) to exercise the
skew-handling paths.
"""

from __future__ import annotations

ENTITY_NS = "http://kg.local/entity/"

_FIRST = [
    "Acme", "Borealis", "Cascade", "Delta", "Everest", "Fathom", "Granite",
    "Horizon", "Ion", "Juniper", "Krypton", "Lumen", "Meridian", "Nimbus",
    "Onyx", "Pinnacle", "Quartz", "Ridge", "Summit", "Tundra", "Umbra",
    "Vertex", "Willow", "Xenon", "Yonder",
]
_SECOND = ["Labs", "Systems", "Works"]


def build_alias_table() -> dict[str, str]:
    """surface form -> canonical entity IRI (deterministic)."""
    table: dict[str, str] = {}
    for i in range(50):
        iri = "%sE%03d" % (ENTITY_NS, i)
        name = "%s %s" % (_FIRST[i % 25], _SECOND[i // 25 % 3])
        # primary surface form must be unique per entity
        primary = "%s %d" % (name, i)
        table[primary] = iri
        table["%s Corporation %d" % (_FIRST[i % 25], i)] = iri
    return table


def entity_surface(i: int) -> str:
    """The primary surface form for entity i (used by the generator)."""
    return "%s %s %d" % (_FIRST[i % 25], _SECOND[i // 25 % 3], i)


def entity_iri(i: int) -> str:
    return "%sE%03d" % (ENTITY_NS, i)
