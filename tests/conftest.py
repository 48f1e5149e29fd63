"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md §4). The axon TPU plugin in
this image force-registers itself, so ``jax.devices()`` may still report the
TPU; code under test must request ``jax.devices("cpu")`` explicitly via
``legalrag_tpu.parallel.local_devices()``.
"""

import os

os.environ.setdefault("XLA_FLAGS",
                      os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")
os.environ["LEGALRAG_FORCE_CPU"] = "1"
# The suite (and every subprocess it spawns — CLI e2e, multihost workers)
# is CPU-only: scrub the TPU relay plugin from the inherited env so child
# processes neither pay its handshake nor hang when the relay is down.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import sys
from pathlib import Path

import jax
import pytest

# The suite is CPU-only by design. Restrict backend init to the CPU
# platform BEFORE the first backend use: initializing the axon TPU plugin
# would (a) waste the relay handshake per test process and (b) block ~28
# minutes and then raise when the relay is down (observed round 3) —
# jax.devices("cpu") alone still initializes every registered platform.
jax.config.update("jax_platforms", "cpu")
# Pin the default device so all jitted code in tests runs on (8 virtual)
# CPU devices with f32 exactness.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ZH_RAW = REPO / "data" / "raw" / "minfadian.txt"
UCC_DIR = REPO / "data" / "raw" / "ucc"


@pytest.fixture(scope="session")
def zh_text():
    if not ZH_RAW.exists():
        pytest.skip("zh raw corpus not present")
    return ZH_RAW.read_text(encoding="utf-8")


@pytest.fixture(scope="session")
def ucc_texts():
    if not UCC_DIR.exists():
        pytest.skip("ucc raw corpus not present")
    out = {}
    for p in sorted(UCC_DIR.glob("*.txt")):
        t = p.read_text(encoding="utf-8")
        if t.strip():
            out[p.name] = t
    return out


@pytest.fixture(scope="session")
def zh_chunks(zh_text):
    from legalrag_tpu.corpus import parse_auto

    return [r.to_chunk() for r in parse_auto(zh_text, source="minfadian.txt")]


@pytest.fixture(scope="session")
def en_chunks(ucc_texts):
    from legalrag_tpu.corpus import parse_auto

    chunks = []
    for name, text in ucc_texts.items():
        chunks.extend(r.to_chunk() for r in parse_auto(text, source=name))
    return chunks
