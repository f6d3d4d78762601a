"""tools/update_perf_docs.py: bench JSON -> regenerated doc tables."""

import importlib.util
import json
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "update_perf_docs",
    os.path.join(os.path.dirname(__file__), "..", "tools", "update_perf_docs.py"),
)
upd = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(upd)

RECORD = {
    "parsed": {
        "metric": "rtf_0.6b_customvoice_66frames_v5e_int8wo",
        "value": 0.034,
        "unit": "rtf_gen_time_over_audio_duration",
        "vs_baseline": 20.6,
        "ttft_ms": 35.0,
        "ttfa_ms": 110.0,
        "scenarios": {
            "long_decode_1.7b_512f": {
                "rtf": 0.0748, "gen_frames_s": 176.7, "cache_slots": 4096
            },
            "batch32_int8": {
                "tok_s": 127981, "frame_ms": 4.0, "per_seq_rtf": 0.05
            },
            "unknown_new_scenario": {"foo": 1},
        },
        "skipped": [{"scenario": "vd", "reason": "budget"}],
    }
}


def test_build_table_covers_every_scenario_and_skip():
    table = upd.build_table(RECORD["parsed"], "BENCH_rXX.json")
    assert "RTF **0.034**" in table and "20.6x" in table
    assert "**35.0 ms**" in table and "**110.0 ms**" in table
    assert "1.7B Base long decode" in table and "**0.0748**" in table
    assert "127,981 codec tok/s" in table
    # unknown scenarios still land (raw JSON) — no silent drops
    assert "unknown_new_scenario" in table
    # skips are surfaced
    assert "vd (budget)" in table


def test_rewrites_only_marker_blocks(tmp_path, monkeypatch):
    doc = tmp_path / "README.md"
    doc.write_text(
        "# title\nprose stays\n\n"
        f"{upd.BEGIN}\nold stale table\n{upd.END}\n\ntail prose stays\n"
    )
    rec = tmp_path / "BENCH_r09.json"
    rec.write_text(json.dumps(RECORD))
    monkeypatch.setattr(upd, "ROOT", str(tmp_path))
    monkeypatch.setattr(upd, "DOCS", ("README.md",))
    upd.main([str(rec)])
    out = doc.read_text()
    assert "old stale table" not in out
    assert "prose stays" in out and "tail prose stays" in out
    assert "BENCH_r09.json" in out and "127,981" in out
    # idempotent
    before = out
    upd.main([str(rec)])
    assert doc.read_text() == before


def test_real_docs_carry_marker_blocks():
    root = os.path.join(os.path.dirname(__file__), "..")
    for name in upd.DOCS:
        text = open(os.path.join(root, name)).read()
        assert upd.BEGIN in text and upd.END in text, name


def test_scale_curve_block(tmp_path, monkeypatch):
    """exp_scale_curve.json (tools/exp_scale_curve.py) regenerates the
    SCALING.md batch-sweep block; docs without the marker are untouched."""
    doc = tmp_path / "SCALING.md"
    doc.write_text(
        "prose\n\n"
        f"{upd.BEGIN}\nstale\n{upd.END}\n\n"
        f"{upd.CURVE_BEGIN}\n(pending)\n{upd.CURVE_END}\nafter\n"
    )
    rec = tmp_path / "BENCH_r09.json"
    rec.write_text(json.dumps(RECORD))
    (tmp_path / "exp_scale_curve.json").write_text(json.dumps({
        "frames": 66,
        "rows": [
            {"B": 8, "cache_len": 128, "kv": "bf16", "tok_s": 48105,
             "ms_per_frame": 2.66, "per_seq_rtf": 0.0335},
            {"B": 64, "cache_len": 512, "kv": "int8", "tok_s": 150000,
             "ms_per_frame": 4.5, "per_seq_rtf": 0.057},
        ],
    }))
    monkeypatch.setattr(upd, "ROOT", str(tmp_path))
    monkeypatch.setattr(upd, "DOCS", ("SCALING.md",))
    upd.main([str(rec)])
    out = doc.read_text()
    assert "(pending)" not in out
    assert "| 8 | 128 | bf16 | **48,105** | 2.66 | 0.0335 |" in out
    assert "| 64 | 512 | int8 | **150,000** | 4.5 | 0.057 |" in out
    assert out.endswith("after\n")
