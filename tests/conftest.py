"""Test configuration: run JAX on CPU with 8 virtual devices so mesh
sharding, collective top-k merge, and pjit partitioning are exercised
without TPU hardware (SURVEY §4d)."""

import os

# The harness exports JAX_PLATFORMS=axon (the TPU tunnel); tests must run on
# CPU with 8 virtual devices, and the env var alone is overridden by the
# plugin, so force it via jax.config before any backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Pin the suite to fast deterministic models: the repo ships trained
# MiniLM bi-/cross-encoder checkpoints under ./models that
# default_encoder("auto") / CrossEncoderReranker would otherwise serve,
# turning every engine-building test into real transformer forwards
# (slow) and shifting pinned score expectations. The pretrained paths
# have dedicated tests (tests/test_models.py re-enables discovery).
os.environ.setdefault("HST_ENCODER", "hashing")
os.environ.setdefault("HST_CKPT_DISCOVERY", "0")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: XLA compilation dominates test runtime.
jax.config.update("jax_compilation_cache_dir", "/tmp/hst_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


DEMO_DOCS = [
    "Python is a versatile programming language used in data science.",
    "Machine learning models learn patterns from training data.",
    "The weather today is sunny with a light breeze.",
    "Deep learning uses neural networks with many layers.",
    "JavaScript runs in web browsers and on servers with Node.",
    "Cooking pasta requires boiling water and a pinch of salt.",
    "Artificial intelligence is transforming many industries.",
    "The stock market fluctuated sharply this quarter.",
    "Neural networks are inspired by biological brains.",
    "Gardening in spring brings colorful flowers to the yard.",
    "Natural language processing lets machines understand text.",
    "Basketball players train for agility and endurance.",
]


@pytest.fixture(scope="session")
def demo_docs():
    return list(DEMO_DOCS)
