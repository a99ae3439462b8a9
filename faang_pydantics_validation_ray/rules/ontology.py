"""Ontology subclass-closure membership (T4 completion — graph restriction).

Graft of the reference's `graph_restriction` check: a term is valid iff it
is a (transitive, include_self) `rdfs:subClassOf` descendant of an allowed
ancestor class, resolved per-record from a link table (species → allowed
breed root, /root/reference/generic_validator_classes.py:27-64 schema,
applied by BreedSpeciesValidator at :277-301 with SPECIES_BREED_LINKS,
/root/reference/constants.py:230-238).

Ray-Data-first restatement: the reference calls an external Elixir service
per term; here the ontology is a small static EDGE list whose transitive
closure is precomputed ONCE on the driver (the OLS-prefetch analogue) and
broadcast into a vectorized `is_in` over (root, term) pair keys — no
per-row lookups, no service, no shuffle.

The sandbox ontology is a deterministic brand tree over the TPC-H `part`
table (the image-table vocab dim plays T1/T2; this plays the *hierarchy*):

    ROOT#BUDGET  ── GRP#1 ── Brand#1..8
               └── GRP#2 ── Brand#9..16
    ROOT#PREMIUM ── GRP#2 (shared subtree)
               └── GRP#3 ── Brand#17..25

with the link table p_type → allowed root: ECONOMY/SMALL/PROMO are
restricted to ROOT#BUDGET, LARGE/MEDIUM/STANDARD to ROOT#PREMIUM — so
e.g. an ECONOMY part branded Brand#20 violates the restriction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# static ontology edges (parent, child) — the dim-table analogue of the
# reference's OBO ontology slice
BRAND_ONTOLOGY_EDGES: tuple[tuple[str, str], ...] = (
    ("ROOT#BUDGET", "GRP#1"), ("ROOT#BUDGET", "GRP#2"),
    ("ROOT#PREMIUM", "GRP#2"), ("ROOT#PREMIUM", "GRP#3"),
    *[("GRP#1", f"Brand#{i}") for i in range(1, 9)],
    *[("GRP#2", f"Brand#{i}") for i in range(9, 17)],
    *[("GRP#3", f"Brand#{i}") for i in range(17, 26)],
)

# link table: record attribute → allowed ancestor class (SPECIES_BREED_LINKS
# analogue)
TYPE_ROOT_LINKS: dict[str, str] = {
    "ECONOMY": "ROOT#BUDGET", "SMALL": "ROOT#BUDGET", "PROMO": "ROOT#BUDGET",
    "LARGE": "ROOT#PREMIUM", "MEDIUM": "ROOT#PREMIUM",
    "STANDARD": "ROOT#PREMIUM",
}

_SEP = "\x1f"


def transitive_closure(edges=BRAND_ONTOLOGY_EDGES,
                       include_self: bool = True) -> set[tuple[str, str]]:
    """(ancestor, descendant) pairs reachable via 1+ edges; with
    ``include_self`` every node is its own descendant (the reference schema
    sets ``"include_self": True``). Driver-side BFS over the tiny dim —
    the precompute the SURVEY T4 row prescribes."""
    children: dict[str, set[str]] = {}
    nodes: set[str] = set()
    for p, c in edges:
        children.setdefault(p, set()).add(c)
        nodes.update((p, c))
    closure: set[tuple[str, str]] = set()
    for root in nodes:
        stack = list(children.get(root, ()))
        seen: set[str] = set()
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            closure.add((root, n))
            stack.extend(children.get(n, ()))
    if include_self:
        closure.update((n, n) for n in nodes)
    return closure


def closure_pair_set(closure: set[tuple[str, str]]) -> pa.Array:
    """Broadcastable value set of ``ancestor<SEP>descendant`` pair keys."""
    return pa.array(sorted(f"{a}{_SEP}{d}" for a, d in closure),
                    type=pa.string())


def subclass_violation_mask(root: "pa.Array | pa.ChunkedArray",
                            term: "pa.Array | pa.ChunkedArray",
                            pair_set: pa.Array) -> np.ndarray:
    """True where (root, term) is NOT in the closure — vectorized: one
    string concat + one ``is_in`` per batch. Null root or term rows pass
    (presence is the required-field rule's job)."""
    r = root.combine_chunks() if isinstance(root, pa.ChunkedArray) else root
    t = term.combine_chunks() if isinstance(term, pa.ChunkedArray) else term
    pair = pc.binary_join_element_wise(pc.cast(r, pa.string()),
                                       pc.cast(t, pa.string()), _SEP)
    ok = pc.is_in(pair, value_set=pair_set)
    present = pc.and_(pc.is_valid(r), pc.is_valid(t))
    return np.asarray(pc.and_(pc.invert(pc.fill_null(ok, False)),
                              present))


def subclass_member(term_col: str, root_col: str,
                    closure: set[tuple[str, str]],
                    severity: str = "error"):
    """Ruleset kernel (P-family style): ``term_col`` must be a descendant
    of the class named by ``root_col`` per the precomputed closure."""
    pair_set = closure_pair_set(closure)
    msg = (f"'{term_col}' is not a subclass of the ontology class in "
           f"'{root_col}'")

    def kernel(t: pa.Table, ctx) -> list:
        if term_col not in t.column_names or root_col not in t.column_names:
            return []
        bad = subclass_violation_mask(t.column(root_col), t.column(term_col),
                                      pair_set)
        return [(bad & ctx.present(term_col) & ctx.present(root_col),
                 severity, msg)]
    return kernel
