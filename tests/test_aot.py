"""AOT executable snapshots (utils/aot.py): save once, boot with zero
compiles.  The round trip runs in a clean single-device CPU subprocess:
under this suite's FORCED 8-device host mesh, jax 0.9.0's deserialized
executables reconstruct an 8-shard device assignment while reporting
single-device input shardings and refuse plain-array calls — a
multi-virtual-device artifact, not present on the real axon chip where
the round trip was verified bitwise (ROUND4_NOTES.md)."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]

_SCRIPT = r"""
import sys, json
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from fast_monte_carlo_tpu.utils.aot import aot_compile_cached

traces = []
def f(x):
    traces.append(1)
    return jnp.sin(x @ x.T).sum() + 12345.0

tmp = sys.argv[1]
x = jnp.ones((64, 64), jnp.float32)
exe1 = aot_compile_cached(f, (x,), key="t", cache_dir=tmp)
want = float(exe1(x))
n_files1 = len(list(__import__("pathlib").Path(tmp).glob("t_*.aotx")))

exe2 = aot_compile_cached(f, (x,), key="t", cache_dir=tmp)
got = float(exe2(x))

y = jnp.ones((32, 32), jnp.float32)
exe3 = aot_compile_cached(f, (y,), key="t", cache_dir=tmp)
ok3 = bool(jnp.isfinite(exe3(y)))
n_files2 = len(list(__import__("pathlib").Path(tmp).glob("t_*.aotx")))

# corrupt snapshot falls back to a fresh compile
p = sorted(__import__("pathlib").Path(tmp).glob("t_*.aotx"))[0]
p.write_bytes(b"garbage")
exe4 = aot_compile_cached(f, (x,), key="t", cache_dir=tmp)
got4 = float(exe4(x))

print(json.dumps({{"want": want, "got": got, "got4": got4, "ok3": ok3,
                   "traces": len(traces), "n1": n_files1, "n2": n_files2}}))
"""


def test_aot_snapshot_roundtrip(tmp_path):
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "HOME": "/root"}
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=str(REPO)),
         str(tmp_path)],
        capture_output=True, text=True, timeout=300, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["got"] == out["want"]          # snapshot load, same result
    assert out["got4"] == out["want"]         # corrupt file -> recompile
    assert out["ok3"]
    # traces: exe1 compile + exe3 (new signature) = 2; exe2 loaded the
    # snapshot without retracing, and exe4's corrupt-fallback recompile
    # reuses jax's in-process trace cache (same fn + avals)
    assert out["traces"] == 2
    assert out["n1"] == 1 and out["n2"] == 2  # one snapshot per signature


def test_aot_fingerprint_keys_on_signature():
    import jax.numpy as jnp

    from fast_monte_carlo_tpu.utils.aot import aot_fingerprint

    x = jnp.ones((8, 8)), jnp.zeros((4,), jnp.int32)
    assert aot_fingerprint("a", x) == aot_fingerprint("a", x)
    assert aot_fingerprint("a", x) != aot_fingerprint("b", x)
    y = jnp.ones((8, 8)), jnp.zeros((5,), jnp.int32)
    assert aot_fingerprint("a", x) != aot_fingerprint("a", y)
    # static args key by VALUE: a chunk-size change must miss the snapshot
    z24 = (jnp.ones((8, 8)), 24)
    z48 = (jnp.ones((8, 8)), 48)
    assert aot_fingerprint("a", z24, (1,)) != aot_fingerprint("a", z48, (1,))
    # and non-arraylike statics don't crash the fingerprint
    assert aot_fingerprint("a", (jnp.ones((4,)), "mode"), (1,))
