"""Join-based rule operators: J2 mismatch counting, J4 2-cycle detection,
semi/anti wrappers (Dataset.join)."""

import pandas as pd
import pytest


@pytest.fixture()
def edges(ray_session):
    import ray.data as rd
    return rd.from_pandas(pd.DataFrame({
        "src": ["a", "b", "c", "d", "e", "x"],
        "dst": ["b", "a", "d", "c", "f", "x"],
    }))  # cycles: (a,b), (c,d); self-loop: (x,x)


def test_two_cycles(edges):
    from faang_pydantics_validation_ray.functions.joins import two_cycles
    out = two_cycles(edges).to_pandas().sort_values(["src", "dst"])
    got = set(zip(out.src, out.dst))
    assert got == {("a", "b"), ("c", "d"), ("x", "x")}


def test_semi_anti(ray_session):
    import ray.data as rd
    from faang_pydantics_validation_ray.functions.joins import anti_join, semi_join
    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4], "v": "abcd".split("")
                                        if False else list("abcd")}))
    right = rd.from_pandas(pd.DataFrame({"k": [2, 4]}))
    assert sorted(r["k"] for r in semi_join(left, right, "k").take_all()) == [2, 4]
    assert sorted(r["k"] for r in anti_join(left, right, "k").take_all()) == [1, 3]


def test_join_mismatch_count(ray_session):
    import pyarrow.compute as pc
    import ray.data as rd
    from faang_pydantics_validation_ray.functions.joins import join_mismatch_count
    child = rd.from_pandas(pd.DataFrame(
        {"pid": [1, 1, 2, 3], "species": ["cat", "dog", "cat", "owl"]}))
    parent = rd.from_pandas(pd.DataFrame(
        {"id": [1, 2, 3], "p_species": ["cat", "cat", "owl"]}))
    bad = join_mismatch_count(
        child, parent, "pid", "id",
        lambda t: pc.not_equal(t.column("species"), t.column("p_species")))
    assert bad == 1  # the (1, dog) child
