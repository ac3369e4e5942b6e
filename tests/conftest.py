import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware.  Must be set before jax initializes.  The
# environment may export JAX_PLATFORMS=axon (TPU tunnel) and the axon plugin
# ignores the env var, so force the platform through jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
REFERENCE = Path("/root/reference")
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def reference_dir() -> Path:
    if not REFERENCE.exists():
        pytest.skip("reference artifacts not mounted")
    return REFERENCE


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(0)


def make_state_batch(rng: np.random.Generator, n: int) -> "np.ndarray":
    """Random plausible 17-feature state rows in the reference's ST1 order."""
    down = rng.integers(1, 5, n)
    distance = np.round(rng.uniform(0.5, 25, n) * 2) / 2
    ytg = rng.integers(1, 100, n).astype(np.float64)
    seconds = rng.integers(0, 3601, n).astype(np.float64)
    half = np.where(seconds > 1800, 1, 2)
    cols = {
        "down": down.astype(np.float64),
        "distance": distance,
        "yardsToGoal": ytg,
        "is_red_zone": (ytg <= 20).astype(np.float64),
        "score_diff": rng.integers(-30, 31, n).astype(np.float64),
        "seconds_remaining": seconds,
        "offenseTimeouts": rng.integers(0, 4, n).astype(np.float64),
        "defenseTimeouts": rng.integers(0, 4, n).astype(np.float64),
        "sp_rating_off": rng.uniform(-20, 30, n),
        "sp_offense_rating_off": rng.uniform(10, 45, n),
        "sp_defense_rating_def": rng.uniform(10, 45, n),
        "sp_rating_def": rng.uniform(-20, 30, n),
        "goal_to_go": (distance >= ytg - 0.5).astype(np.float64),
        "fourth_and_short": ((down == 4) & (distance <= 2.0)).astype(np.float64),
        "fg_range": (ytg <= 33).astype(np.float64),
        "half": half.astype(np.float64),
        "two_minute": ((seconds % 1800) <= 120).astype(np.float64),
    }
    return cols
