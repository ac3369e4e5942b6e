"""Bisect the rbg + --no-stats pathology (VERDICT r2 #7).

Round-2 measurements: rbg+stats 732k games/s, threefry+no-stats 712k, but
rbg+no-stats 155k (217k at unroll 8) — an undiagnosed XLA scheduling
interaction one config flag away from the defaults.  This probe times the
2x2 plus targeted variants in ONE process (shared table build, persistent
compile cache) and optionally wraps the pathological config in a
jax.profiler trace.

Usage:  python benchmarks/rbg_nostats_probe.py [--trace DIR] [-n 131072]
"""
import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=131072)
    ap.add_argument("--trace", default=None,
                    help="jax.profiler trace dir for the pathological config")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import dataclasses

    import numpy as np

    from fast_monte_carlo_tpu.api import MatchupRunner
    from fast_monte_carlo_tpu.config import SimConfig
    from fast_monte_carlo_tpu.data import (
        build_team_context_from_sp_flex, load_sp_flex,
    )
    from fast_monte_carlo_tpu.models.heads import load_heads
    from fast_monte_carlo_tpu.utils.profiling import trace_context

    sp = load_sp_flex("/root/reference/PregameSPPlus2025_1.csv")
    a = build_team_context_from_sp_flex("Kansas State", 2025, 1, sp)
    b = build_team_context_from_sp_flex("Iowa State", 2025, 1, sp)
    heads = load_heads("/root/reference")

    n_pairs = args.n // 2

    def bench(label, rng, stats, **eng):
        cfg = SimConfig()
        cfg = cfg.replace(engine=dataclasses.replace(
            cfg.engine, rng_impl=rng, **eng))
        r = MatchupRunner(a, b, heads, cfg, mode="table",
                          table_quality="nano")
        # warm/compile
        out = r.run_pairs(n_pairs, seed=0, collect_players=False,
                          collect_stats=stats, block=False)
        _ = np.asarray(out.score[:8])
        best = None
        for i in range(args.repeats):
            t0 = time.perf_counter()
            out = r.run_pairs(n_pairs, seed=i + 1, collect_players=False,
                              collect_stats=stats, block=False)
            _ = np.asarray(out.score[:8])   # forced transfer (axon rule)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rate = args.n / best
        print(f"{label:42s} {rate:12,.0f} games/s", flush=True)
        return r, rate

    print(f"# n={args.n} games/launch, single launches", flush=True)
    bench("rbg + stats", "rbg", True)
    r_path, rate_path = bench("rbg + no-stats (PATHOLOGICAL?)", "rbg", False)
    bench("rbg + no-stats, dot select", "rbg", False, nano_select="dot")
    bench("rbg + stats, dot select", "rbg", True, nano_select="dot")
    bench("threefry + stats, dot select", "threefry", True,
          nano_select="dot")

    if args.trace:
        with trace_context(args.trace):
            out = r_path.run_pairs(n_pairs, seed=99, collect_players=False,
                                   collect_stats=False, block=False)
            _ = np.asarray(out.score[:8])
        print(f"# trace written to {args.trace}", flush=True)


if __name__ == "__main__":
    main()
