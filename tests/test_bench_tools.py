

def test_compact_stdout_line_fits_driver_tail_capture():
    """The driver parses the LAST line of a 2000-byte stdout tail; the
    compact line must fit the budget for any query count, keeping the
    slowest (most informative) entries and counting omissions."""
    import json

    from bench import compact_stdout_line

    timings = {f"q{i:03d}": round(0.1 + i * 0.01, 3) for i in range(200)}
    compact = {
        "metric": "headline_steady_total_s",
        "value": 123.4,
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "cold_total": 150.0,
        "ingest_rows_per_sec": 100000,
    }
    line = compact_stdout_line(compact, timings, budget=1800)
    assert len(line) <= 1800
    doc = json.loads(line)
    assert doc["metric"] == "headline_steady_total_s" and doc["value"] == 123.4
    kept = doc["queries"]
    assert doc["queries_omitted_fastest"] == 200 - len(kept) > 0
    assert doc["n_queries"] == 200
    # the kept set is exactly the slowest entries
    slowest = sorted(timings, key=timings.get)[-len(kept):]
    assert set(kept) == set(slowest)
    # small maps pass through untouched
    small = {"q1": 1.0}
    c2 = dict(compact, queries=small)
    assert json.loads(compact_stdout_line(c2, small, budget=1800))["queries"] == small
