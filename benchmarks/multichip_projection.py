"""v5e-8 throughput projection for the sharded summary workload.

Real multi-chip hardware is not reachable from this environment (one
tunneled v5e chip), so the projection is built exactly as VERDICT r2 #1
prescribes: measured single-chip rate x 8, minus the dispatch/collective
overhead of the sharded program measured on the 8-device virtual CPU mesh
(the same mesh the test suite and driver dryrun use).

Method: on the virtual mesh, time N back-to-back launches of
  (a) simulate_games_sharded            — sim only, no collective
  (b) simulate_moments_sharded          — sim + per-device reduction + psum
with identical keys/shapes.  (b) - (a) isolates the moment-reduction +
psum + replication cost per launch; relative to the per-launch sim time it
bounds the fraction the collective would cost on real ICI (virtual-mesh
collectives run over shared memory; actual v5e ICI all-reduce of a ~1.3 KB
pytree is ~10 microseconds, far below this bound).

Writes benchmarks/MULTICHIP_PROJECTION.md.

Usage:  JAX_PLATFORMS=cpu python benchmarks/multichip_projection.py
"""
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from fast_monte_carlo_tpu.config import SimConfig  # noqa: E402
from fast_monte_carlo_tpu.data import (  # noqa: E402
    build_team_context_from_sp_flex, load_sp_flex,
)
from fast_monte_carlo_tpu.ops.game import make_analytic_heads_eval  # noqa: E402
from fast_monte_carlo_tpu.ops.pack import build_packs  # noqa: E402
from fast_monte_carlo_tpu.models.heads import ModelHeads  # noqa: E402
from fast_monte_carlo_tpu.parallel import (  # noqa: E402
    simulate_games_sharded, simulate_moments_sharded,
)

# measured on the real chip, bench default (BENCH_r02 + round-3 runs)
SINGLE_CHIP_GAMES_PER_SEC = 1_506_521.0

N = 8192            # games per launch on the virtual mesh (CPU-sized)
REPEATS = 5


def main():
    cfg = SimConfig()
    sp = load_sp_flex("/root/reference/PregameSPPlus2025_1.csv")
    a = build_team_context_from_sp_flex("Kansas State", 2025, 1, sp)
    b = build_team_context_from_sp_flex("Iowa State", 2025, 1, sp)
    pack, _ = build_packs(a, b, ModelHeads(), cfg)
    he = make_analytic_heads_eval(cfg)
    fo = np.arange(N) % 2
    key = jax.random.PRNGKey(0)

    # warm both programs
    out = simulate_games_sharded(pack, cfg, he, None, key, N, fo)
    jax.block_until_ready(out.score)
    m = simulate_moments_sharded(pack, cfg, he, None, key, N, fo)
    jax.block_until_ready(m.n)

    def t_sim():
        t0 = time.perf_counter()
        for r in range(REPEATS):
            o = simulate_games_sharded(pack, cfg, he, None,
                                       jax.random.fold_in(key, r), N, fo)
        jax.block_until_ready(o.score)
        _ = np.asarray(o.score[:4])
        return (time.perf_counter() - t0) / REPEATS

    def t_moments():
        t0 = time.perf_counter()
        acc = None
        for r in range(REPEATS):
            mm = simulate_moments_sharded(pack, cfg, he, None,
                                          jax.random.fold_in(key, r), N, fo)
            acc = mm if acc is None else jax.tree_util.tree_map(
                lambda x, y: x + y, mm, acc)
        _ = np.asarray(acc.n)
        return (time.perf_counter() - t0) / REPEATS

    sim = min(t_sim() for _ in range(3))
    mom = min(t_moments() for _ in range(3))
    # mom can measure FASTER than sim: the moments program's only output is
    # the ~1.3 KB replicated pytree while sim-only materializes the full
    # sharded score batch — a negative delta means the reduce+psum cost is
    # below noise, so it clamps to a 0%-overhead projection (upper bound)
    overhead = mom - sim
    frac = max(0.0, overhead / mom)
    projected = 8 * SINGLE_CHIP_GAMES_PER_SEC * (1.0 - frac)

    md = f"""# v5e-8 projection — sharded summary workload (round 3)

Measured on the 8-device virtual CPU mesh ({N} games/launch,
best of 3x{REPEATS} pipelined launches):

| program | s/launch |
|---|---|
| simulate_games_sharded (sim only) | {sim:.4f} |
| simulate_moments_sharded (sim + per-device reduce + psum) | {mom:.4f} |
| reduction+collective overhead | {overhead:+.4f} ({100*frac:.2f}% of launch) |

Projection: single-chip bench default {SINGLE_CHIP_GAMES_PER_SEC:,.0f}
games/s x 8 chips x (1 - {frac:.4f}) = **{projected:,.0f} games/s** on a
v5e-8.

Notes:
* The trial axis is embarrassingly parallel (per-device fold_in keys, no
  communication during the game loop), so the only cross-chip cost is the
  final ~1.3 KB ScoreMoments all-reduce per launch — on real ICI that is
  O(10 us) against a ~40 ms launch, i.e. below measurement noise; the
  virtual-mesh overhead above is an upper bound (it includes the shared-
  memory reduction itself).
* Host dispatch is shared: one shard_map launch drives all 8 chips, so
  per-launch Python overhead does not scale with chip count (vs 8
  independent single-chip processes).
* Scaling caveat: per-chip batch must stay at the measured optimum (65k
  games/launch/chip => 524k games/launch at v5e-8); the workload has
  millions of independent games, so this is free.
"""
    out_path = REPO / "benchmarks" / "MULTICHIP_PROJECTION.md"
    out_path.write_text(md)
    print(md)


if __name__ == "__main__":
    main()
