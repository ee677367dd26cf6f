"""Bench transport contract: the driver captures only the LAST ~2000
chars of stdout (round 3 lost its artifact to an oversized line —
``parsed: null``).  Pin that the headline stays under the limit at the
CURRENT query count and keeps the per-query steal evidence (VERDICT r4
#1) — and that the shed path degrades to (sec, cal), never to nothing.
No Spark session needed: ``headline`` is pure dict manipulation."""

import json

import bench


def _fake_record(names: list) -> dict:
    return {
        "value": 123.456,
        "queries": {n: 12.345 for n in names},
        "queries_cal": {n: 11.22 for n in names},
        "queries_spin": {n: 123.4 for n in names},
        "sf": 0.1,
        "seq_rows": 8_000_000,
        "validate_rows_per_sec": 2_844_950,
        "validate_sec_calibrated": 2.812,
        "validate_rows_per_sec_calibrated": 2_844_950,
        "host_spin_mops_best": 134.7,
        "cpus": 32,
    }


def test_headline_fits_driver_tail_at_current_query_count():
    names = _bench_names() + ["validate_sequences"]
    line = json.dumps(bench.headline(_fake_record(names)))
    assert len(line) < 1900, (len(line), len(names))
    parsed = json.loads(line)
    # every query carries the full (sec, cal, spin) evidence triple
    assert all(len(v) == 3 for v in parsed["q"].values())


def test_headline_evidence_survives_more_growth():
    # headroom: ten more typically-named queries before shedding engages
    names = (_bench_names() + ["validate_sequences"]
             + [f"extra_query_{i}" for i in range(10)])
    line = json.dumps(bench.headline(_fake_record(names)))
    assert len(line) < 1900, (len(line), len(names))


def _bench_names() -> list:
    import ast
    import inspect
    # the literal `names` list inside bench_queries, without running it
    tree = ast.parse(inspect.getsource(bench.bench_queries))
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id == "names"):
            return [c.value for c in node.value.elts]
    raise AssertionError("names list not found in bench_queries")


def test_bench_names_are_real_queries():
    import __spark_entry__ as e
    qs = set(e.queries()) | {"minhash_head_fast"}
    missing = [n for n in _bench_names() if n not in qs]
    assert not missing, missing
