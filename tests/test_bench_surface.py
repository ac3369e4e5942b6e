"""The driver-facing bench surface: `python bench.py --smoke` must run end
to end on CPU and print exactly one parseable JSON line with the contract
fields (the driver records this output every round).  Round 4 adds the
self-describing `meta` block and the wall-clock budget watchdog (emit
best-so-far instead of dying silent — the BENCH_r03 rc=124 fix)."""
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run(*extra, timeout=900):
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--smoke", *extra],
        capture_output=True, text=True, timeout=timeout, cwd=REPO)
    return proc


def _one_json_line(proc):
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE json line on stdout, got: {lines}"
    return json.loads(lines[0])


def test_bench_smoke_json_contract():
    proc = _run("--repeats", "1")
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = _one_json_line(proc)
    assert set(rec) == {"metric", "value", "unit", "vs_baseline", "meta"}
    assert rec["unit"] == "games/sec" and rec["value"] > 0
    assert rec["vs_baseline"] == round(rec["value"] / 40.0, 1)
    # the meta block makes BENCH_r* files self-describing across rounds
    meta = rec["meta"]
    assert {"n_games", "chunk_games", "rng", "mode", "workload", "stats",
            "quality", "ndev", "sharded", "setup_s", "compile_s", "runs",
            "emit"} <= set(meta)
    assert meta["emit"] == "complete" and len(meta["runs"]) >= 1
    # sanity block goes to stderr, not stdout
    assert "sanity" in proc.stderr


def test_bench_budget_expiry_emits_best_so_far():
    """A budget that expires mid-refinement must still produce the JSON
    line (rc=0, emit=budget_expired) — never a silent rc=124-style kill."""
    proc = _run("--repeats", "500", "--budget", "15")
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = _one_json_line(proc)
    assert rec["value"] > 0
    assert rec["meta"]["emit"] in ("budget_expired", "complete")
    # 500 repeats cannot fit in 15s: either the budget-aware loop skipped
    # remaining repeats, or the watchdog emitted mid-refinement
    assert (rec["meta"]["emit"] == "budget_expired"
            or "skipping full-shape repeat" in proc.stderr)
    assert len(rec["meta"]["runs"]) < 500


def test_bench_shard_smoke():
    """--shard runs the trial-sharded moments pipeline over the visible
    mesh and marks the metric + meta accordingly."""
    proc = _run("--repeats", "1", "--shard", "-n", "512", "--chunk", "128")
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = _one_json_line(proc)
    assert rec["metric"].endswith("_sharded")
    assert rec["meta"]["sharded"] is True and rec["meta"]["ndev"] >= 1


def test_bench_budget_too_small_is_loud():
    """If the budget expires before ANY measurement (compile in flight),
    bench exits rc=3 with a diagnostic — distinguishable from a crash,
    and the stderr explains that a retry will hit the finished compile."""
    proc = _run("--repeats", "1", "--budget", "0.5")
    assert proc.returncode == 3, (proc.returncode, proc.stderr[-500:])
    assert not proc.stdout.strip()
    assert "budget expired before ANY measurement" in proc.stderr
