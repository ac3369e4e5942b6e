"""Suite-time governance auditor (VERDICT r4 #7).

Reads .pytest_durations.json (written by every pytest run via conftest)
and FAILS when the suite outgrows its budgets:

* not-slow per-test-duration SUM > NOT_SLOW_BUDGET_S — the dev-loop
  subset has regressed; trim or mark tests slow.
* any test NOT marked @pytest.mark.slow with call time > PER_TEST_CAP_S —
  move it behind the slow marker (listed by name).

Budgets are calibrated to this 1-core host: the not-slow subset's
HISTORICAL band is ~600-1000s of summed call time (wall clock varies
more with host contention — durations sum is steadier).  The failure
threshold is the round-4 worst + 25% per the verdict's regression rule.

Usage:  python -m pytest tests/ -q          (any run updates the record)
        python tests/check_suite_time.py    (audit; exit 1 on violation)
"""
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
NOT_SLOW_BUDGET_S = 1250.0   # round-4 worst observed ~1000s + 25%
PER_TEST_CAP_S = 35.0        # unmarked tests past this belong behind slow


def main() -> int:
    path = REPO / ".pytest_durations.json"
    if not path.exists():
        print("no .pytest_durations.json yet — run pytest first")
        return 2
    data = json.loads(path.read_text())
    tests = data["tests"]
    not_slow = {k: v for k, v in tests.items() if not v["slow"]}
    slow = {k: v for k, v in tests.items() if v["slow"]}
    total = sum(v["s"] for v in not_slow.values())
    stotal = sum(v["s"] for v in slow.values())
    print(f"not-slow: {len(not_slow)} tests, {total:,.0f}s summed call "
          f"time (budget {NOT_SLOW_BUDGET_S:,.0f}s)")
    print(f"slow:     {len(slow)} tests, {stotal:,.0f}s")
    rc = 0
    over = {k: v["s"] for k, v in not_slow.items()
            if v["s"] > PER_TEST_CAP_S}
    if over:
        rc = 1
        print(f"\nFAIL: {len(over)} unmarked test(s) exceed the "
              f"{PER_TEST_CAP_S:.0f}s per-test cap — mark them "
              f"@pytest.mark.slow (or speed them up):")
        for k, s in sorted(over.items(), key=lambda kv: -kv[1]):
            print(f"  {s:7.1f}s  {k}")
    if total > NOT_SLOW_BUDGET_S:
        rc = 1
        print(f"\nFAIL: not-slow subset {total:,.0f}s exceeds the "
              f"{NOT_SLOW_BUDGET_S:,.0f}s budget (historical band "
              f"600-1000s): trim tests or move the biggest behind slow")
    if rc == 0:
        print("OK: suite within time budgets")
        top = sorted(not_slow.items(), key=lambda kv: -kv[1]["s"])[:5]
        print("largest not-slow tests:")
        for k, v in top:
            print(f"  {v['s']:7.1f}s  {k}")
    return rc


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:   # `| head` closed the pipe — not a failure
        raise SystemExit(0)
