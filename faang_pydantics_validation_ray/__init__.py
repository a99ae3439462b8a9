"""faang_pydantics_validation_ray — a from-scratch Ray-Data-native schema +
constraint validation engine with the rule-family capabilities of
FAANG/faang-pydantics-validation (reference at /root/reference, read-only),
re-expressed as vectorized Arrow predicates over ``ray.data.Dataset`` pipelines
of an image+caption table ``(image_id, bytes, w, h, fmt, caption, phash)``.

Subpackages
-----------
- ``imagetable``: deterministic synthetic image codec + table generator (FIXTURES.md §A).
- ``rules``: rule specs + vectorized kernel library (SURVEY.md §2.2 P1–P13).
- ``functions``: sketches (HLL/t-digest), hashing, dedup, ANN, text analysis, joins.
- ``stages``: map_batches stage classes (fused validator, image decode actor pool).
- ``pipelines``: end-to-end validation pipeline, verdicts, reports.
- ``state``: checkpoint / resume with per-partition lineage manifests.
- ``sources``: readers with schema enforcement (P12 unknown-column rejection).

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are owned
by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
