"""Stochastic sampling (temperature / top-k / top-p) — beyond-parity: the
reference sampler is greedy-only (src/sampler.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.runtime.engine import Engine
from xalm_tpu.sampler import sample, sample_argmax


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f32"]) == 0
    return Engine.from_xalm(out)


LOGITS = jnp.asarray([[2.0, 1.0, 0.0, -1.0, -8.0]])


def test_zero_temperature_is_argmax():
    key = jax.random.PRNGKey(0)
    got = sample(LOGITS, key, temperature=0.0)
    assert np.asarray(got).tolist() == np.asarray(sample_argmax(LOGITS)).tolist()


def test_top_k_1_is_argmax():
    for s in range(8):
        got = sample(LOGITS, jax.random.PRNGKey(s), temperature=1.0, top_k=1)
        assert int(np.asarray(got)[0]) == 0


def test_top_k_restricts_support():
    hits = set()
    for s in range(64):
        got = sample(LOGITS, jax.random.PRNGKey(s), temperature=2.0, top_k=2)
        hits.add(int(np.asarray(got)[0]))
    assert hits <= {0, 1}
    assert len(hits) == 2  # at temp 2 both top-2 tokens appear


def test_top_p_restricts_support():
    # softmax(LOGITS): ~[.64, .24, .087, .032, ...]; top_p=.7 keeps {0, 1}
    hits = set()
    for s in range(64):
        got = sample(LOGITS, jax.random.PRNGKey(s), temperature=1.0, top_p=0.7)
        hits.add(int(np.asarray(got)[0]))
    assert hits <= {0, 1}
    # top-1 alone (.64) already under-covers .7, so token 1 must be kept
    assert len(hits) == 2


def test_top_p_always_keeps_top1():
    got = sample(LOGITS, jax.random.PRNGKey(3), temperature=1.0, top_p=1e-6)
    assert int(np.asarray(got)[0]) == 0


def test_sampling_frequencies_track_softmax():
    logits = jnp.asarray([[0.0, np.log(2.0), np.log(4.0)]])
    keys = jax.random.split(jax.random.PRNGKey(42), 4000)
    draws = jax.vmap(lambda k: sample(logits, k, temperature=1.0)[0])(keys)
    counts = np.bincount(np.asarray(draws), minlength=3) / 4000.0
    np.testing.assert_allclose(counts, [1 / 7, 2 / 7, 4 / 7], atol=0.03)


def test_generate_sampling_reproducible(engine):
    prompt = [1, 259, 260, 10, 20]
    a, _ = engine.generate(prompt, 12, stop_on_eos=False, temperature=0.8, seed=7)
    b, _ = engine.generate(prompt, 12, stop_on_eos=False, temperature=0.8, seed=7)
    assert a == b
    assert len(a) == 12
    greedy, _ = engine.generate(prompt, 12, stop_on_eos=False)
    outs = {tuple(engine.generate(prompt, 12, stop_on_eos=False,
                                  temperature=1.5, seed=s)[0]) for s in range(5)}
    # at high temperature the draws can't all collapse onto greedy
    assert outs != {tuple(greedy)}


def test_generate_sampling_segments_consistent(engine):
    """Segmented sampling draws the same per-step subkey chain regardless of
    segment size ONLY within one segmenting — but every segmenting must
    produce valid tokens and the requested length."""
    prompt = [1, 300, 301]
    for seg in (1, 4, 32):
        out, _ = engine.generate(
            prompt, 9, stop_on_eos=False, temperature=0.9, seed=3, segment=seg
        )
        assert len(out) == 9
        assert all(0 <= t < engine.cfg.vocab_size for t in out)


def test_harness_temperature_flag(engine, tmp_path_factory, capsys):
    from xalm_tpu.harness import main as harness

    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf2") / "tiny"))
    out = str(tmp_path_factory.mktemp("x2") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f16"]) == 0
    rc = harness.main([out, "-m", "c", "-i", "hello", "-n", "6",
                       "--temperature", "0.9", "--seed", "11"])
    assert rc == 0
    assert "Generation stats" in capsys.readouterr().out
