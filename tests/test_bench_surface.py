"""The driver-facing bench surface: `python bench.py --smoke` must run end
to end on CPU and print exactly one parseable JSON line with the contract
fields (the driver records this output every round)."""
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_bench_smoke_json_contract():
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--smoke", "--repeats", "1"],
        capture_output=True, text=True, timeout=900, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE json line on stdout, got: {lines}"
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["unit"] == "games/sec" and rec["value"] > 0
    assert rec["vs_baseline"] == round(rec["value"] / 40.0, 1)
    # sanity block goes to stderr, not stdout
    assert "sanity" in proc.stderr
