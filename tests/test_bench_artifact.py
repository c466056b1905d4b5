"""The judged BENCH artifact keeps only the last ~2 KB of bench.py's
stdout (BENCH_r03.json came back `parsed: null` when the full record
overflowed that capture). bench.py now emits a compact headline record
as its final line; these tests pin that the compact record always fits
the capture and carries the fields the judge reads against BASELINE.md.

No Spark session needed — this exercises pure record-shaping code.
"""

import json

import bench


def _representative_full_record() -> dict:
    """A full bench record with every optional section present, sized
    like a real round-3 run (12 query timings, 5 scaling levels with
    visit lists and calib probes, the 56M bigwave pair)."""
    calib = {
        "cpu_matmul_sec": 0.123,
        "mem_stream_sec": 0.987,
        "loadavg": [12.34, 11.22, 9.87],
    }

    def level(cores, urls, sec):
        return {
            "cores": cores,
            "n_docs": urls // 7,
            "wave_urls": urls,
            "wave_warmup_sec": 0.0,
            "wave_sec": sec,
            "wave_runs": [sec * 1.6, sec],
            "wave_jvm_cpu_sec": sec * cores * 0.9,
            "urls_per_sec": round(urls / sec, 1),
            "calib_after": calib,
            "visits": [sec, sec * 1.3, sec * 1.1],
            "visit_calib_matmul": [0.123, 0.456, 0.111],
            "weather_suspect": False,
        }

    def pair():
        return {
            "efficiency": 0.772,
            "efficiency_adjusted": 0.835,
            "cpu_inflation": 1.341,
            "efficiency_work_normalized": 0.822,
        }

    return {
        "metric": "frontier_urls_per_sec",
        "value": 1249020.3,
        "unit": "sec",
        "queries": {
            name: 123.456 for name in bench.BENCH_QUERIES
        },
        "sf": "0.1",
        "crawl": {
            "cores": 32,
            "n_docs": 200000,
            "gen_sec": 12.34,
            "wave_urls": 1400000,
            "wave_seen_preload": 50000,
            "wave_warmup_sec": 10.1,
            "wave_sec": 4.56,
            "wave_runs": [5.67, 4.56],
            "urls_per_sec": 307017.5,
            "crawl_sec": 78.9,
            "crawl_runs": [80.1, 78.9],
            "crawl_urls_extracted": 156248,
            "crawl_urls_accepted": 123456,
            "crawl_urls_deduped": 3456,
            "crawl_urls_per_sec": 1979.5,
        },
        "crawl_inline": {
            "wave_sec": 4.7,
            "wave_runs": [5.1, 4.7],
            "wave_warmup_sec": 9.8,
            "urls_per_sec": 297872.3,
        },
        "scaling": {
            "local1": level(1, 14000000, 240.1),
            "local4": level(4, 14000000, 71.2),
            "local2": level(2, 28000000, 131.2),
            "local8": level(8, 28000000, 42.5),
            "local32": level(32, 28000000, 22.4),
            "floor_sec": {"1": 4.1, "2": 4.0, "4": 3.9, "8": 3.8, "32": 4.2},
            "pair_1v4": pair(),
            "pair_2v8": pair(),
            "pair_8v32": pair(),
            "efficiency": 0.473,
            "efficiency_adjusted": 0.52,
            "cpu_inflation_32v8": 1.97,
            "efficiency_work_normalized": 0.698,
            "efficiency_subsaturation_2v8": 0.772,
            "efficiency_subsaturation_2v8_work_normalized": 0.822,
        },
        "bigseen": {
            "cores": 32,
            "n_seen": 50000000,
            "n_probe": 10000000,
            "novel": 5000000,
            "plain_write_sec": 5.0,
            "bucketed_write_sec": 12.9,
            "anti_join_plain_sec": 11.4,
            "anti_join_bucketed_sec": 1.95,
            "speedup": 5.85,
        },
        "waveseen": {
            "cores": 32,
            "n_docs": 1000000,
            "wave_urls": 7000000,
            "n_seen": 20000000,
            "plain_write_sec": 9.0,
            "bucketed_write_sec": 19.5,
            "wave_sec_plain": 21.3,
            "wave_runs_plain": [30.2, 22.1, 21.3],
            "wave_sec_bucketed": 14.9,
            "wave_runs_bucketed": [20.0, 15.5, 14.9],
            "frontier_rows": 5250000,
            "speedup": 1.43,
        },
        "scaling_bigwave": {
            "wave_urls": 56000000,
            "local2": level(2, 56000000, 262.3),
            "local8": level(8, 56000000, 81.0),
            "pair_2v8": {
                "efficiency": 0.809,
                "cpu_inflation": 1.21,
                "efficiency_work_normalized": 0.979,
            },
            "weather_suspect": False,
        },
        "env": {
            "calib_start": calib,
            "calib_end": calib,
            "quiet_gate": {
                "quiet_at_start": True,
                "waited_sec": 0.0,
                "probes": 1,
            },
        },
    }


def test_compact_fits_tail_capture():
    compact = bench._compact(_representative_full_record())
    line = json.dumps(compact)
    # driver tail capture observed at 2000 chars (BENCH_r03.json);
    # leave headroom for a trailing newline and future query additions
    assert len(line) < 1900, len(line)
    # and it must round-trip as its own JSON line
    assert json.loads(line) == compact


def test_compact_carries_judged_fields():
    compact = bench._compact(_representative_full_record())
    assert compact["metric"] == "frontier_urls_per_sec"
    assert compact["value"] == 1249020.3
    assert set(compact["queries"]) == set(bench.BENCH_QUERIES)
    assert compact["crawl"]["urls_per_sec"] == 307017.5
    assert compact["crawl"]["crawl_urls_per_sec"] == 1979.5
    # every scaling pair the judge grades survives compaction
    for p in ("pair_1v4", "pair_2v8", "pair_8v32"):
        assert compact["scaling"][p]["efficiency"] > 0
    assert compact["bigseen"]["speedup"] == 5.85
    assert compact["waveseen"]["speedup"] == 1.43
    assert compact["waveseen"]["wave_sec_plain"] == 21.3
    assert compact["scaling_bigwave"]["pair_2v8"]["efficiency"] == 0.809
    assert compact["scaling_bigwave"]["wave_urls"] == 56000000
    # weather flags survive so a noisy run is readable as such
    assert compact["scaling"]["weather_suspect"] is False
    assert compact["scaling_bigwave"]["weather_suspect"] is False


def test_compact_without_optional_sections():
    full = _representative_full_record()
    del full["scaling"], full["scaling_bigwave"]
    compact = bench._compact(full)
    assert "scaling" not in compact
    assert "scaling_bigwave" not in compact
    assert json.loads(json.dumps(compact))["value"] == full["value"]


def test_partial_line_with_calib_fits_tail_capture():
    """Every progressive partial now carries the latest calib probe
    (round-4 task 1b) — the line must still fit the driver's ~2 KB
    stdout tail even with every section present."""
    full = _representative_full_record()
    line = json.dumps(
        {
            **bench._compact(full),
            "partial": True,
            "calib": {
                "cpu_matmul_sec": 0.123,
                "mem_stream_sec": 0.987,
                "loadavg": [12.34, 11.22, 9.87],
            },
        }
    )
    assert len(line) < 2000, len(line)


def test_compact_of_early_partial():
    """The first partials carry only queries (+ maybe bigseen): the
    phase reorder means crawl lands LAST, so _compact must not require
    it."""
    early = {
        "metric": "frontier_urls_per_sec",
        "value": 0.0,
        "unit": "sec",
        "sf": "0.1",
        "queries": {name: 1.0 for name in bench.BENCH_QUERIES},
    }
    compact = bench._compact(early)
    assert "crawl" not in compact
    assert json.loads(json.dumps(compact))["value"] == 0.0
    # mid-scaling progress partials survive compaction too
    early["scaling_progress"] = {"2": 210000.0, "8": 800000.0}
    assert bench._compact(early)["scaling_progress"]["8"] == 800000.0
